package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  def events: DataFrame = t("events")
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
