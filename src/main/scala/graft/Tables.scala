package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Lazy accessors for the TPC-H-ish test tables under an sf directory.
  * Reads are plain parquet scans so Catalyst can push filters/prune
  * columns into the scan (verify via PushedFilters/ReadSchema in
  * `.explain("formatted")`).
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")
  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS); with
    * spark.sql.legacy.parquet.nanosAsLong=true it scans as Long ns —
    * convert to a µs TimestampType column (integer division keeps
    * full precision; double math would lose bits past 2^53).
    */
  def events: DataFrame = {
    val raw = t("events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
