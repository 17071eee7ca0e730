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
  /** Schema memoized per (dir, table) — metadata only, what a catalog
    * would provide (r16): a bare `spark.read.parquet` re-infers the
    * schema on EVERY DataFrame construction, which costs a footer-read
    * job per table per query (profiled at ~50 ms each; a 6-table join
    * paid ~0.5 s before its first real stage). The data path is
    * untouched — every query still scans the parquet files; only the
    * immutable StructType is reused.
    */
  private def t(name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    spark.read.schema(Tables.cachedSchema(spark, path)).parquet(path)
  }
  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  /** events.ts has shipped as parquet TIMESTAMP(NANOS) (scans as Long
    * ns under nanosAsLong — integer division keeps full precision;
    * double math would lose bits past 2^53) and as timezone-less
    * TIMESTAMP(MICROS) (scans as TIMESTAMP_NTZ unless the session
    * disables inferTimestampNTZ). Normalize every shape to plain
    * TimestampType; with a UTC session the NTZ cast is instant-exact.
    */
  def events: DataFrame = Tables.normalizeTs(t("events"))
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  /** Memoized parquet schemas, keyed on (path, path mtime) — r17: a
    * path-only key silently planned against a STALE schema if a table
    * was rewritten with a different shape in the same JVM (what a
    * catalog's REFRESH exists for). The mtime probe is one
    * getFileStatus per table construction (~µs on any FS, no Spark
    * job) vs the ~50 ms footer-inference job the memoization removed.
    * Residual assumption, documented: an IN-PLACE rewrite of part
    * files inside a directory table that leaves the directory entry
    * untouched keeps the old key — Spark's own overwrite mode deletes
    * and recreates the directory, so this requires bypassing Spark to
    * hit. Stale (path, old-mtime) entries linger in the map; they are
    * a few hundred bytes each and unreachable, accepted.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long),
      org.apache.spark.sql.types.StructType]()

  private[graft] def cachedSchema(spark: SparkSession,
                                  path: String): org.apache.spark.sql.types.StructType = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mtime = fs.getFileStatus(p).getModificationTime
    schemaCache.computeIfAbsent((path, mtime),
      _ => spark.read.parquet(path).schema)
  }

  /** Normalize an events frame's `ts` to plain TimestampType whichever
    * physical shape the source files carry (see `Tables#events`).
    */
  def normalizeTs(raw: DataFrame): DataFrame = raw.schema("ts").dataType match {
    case LongType =>
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case org.apache.spark.sql.types.TimestampNTZType =>
      raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    case _ => raw
  }
}
