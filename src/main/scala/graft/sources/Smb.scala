package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Sort-merge-bucket IO — graft's counterpart to scio-smb
  * (reference: scio-smb/src/main/java/org/apache/beam/sdk/extensions/
  * smb/SortedBucketIO.java and scio-smb package.scala): write a table
  * pre-hashed into buckets and sorted within each, so repeated joins
  * on the bucket key never shuffle the data again.
  *
  * Spark-first this is native bucketed tables: `bucketBy(n, key)
  * .sortBy(key)` on write; on read Catalyst recognizes matching
  * bucketing on both join sides and plans a sort-merge join with NO
  * Exchange (asserted in SmbSpec). The input is repartitioned to one
  * file per bucket so the on-read sort can also be elided.
  *
  * At 100 TB this is the difference between shuffling the fact table
  * once per join and never: bucket the canonical fact tables at write
  * time, and every downstream join/agg on the bucket key is
  * exchange-free.
  */
object Smb {

  /** Write `df` as a bucketed+sorted external table at `path`.
    * One file per bucket (repartition by the bucket key first) keeps
    * reads one-partition-per-bucket and sorted.
    */
  def writeBucketed(df: DataFrame, table: String, path: String, buckets: Int,
                    bucketCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val sort = if (sortCols.nonEmpty) sortCols else bucketCols
    df.repartition(buckets, bucketCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sort.head, sort.tail: _*)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two co-bucketed tables on their bucket key. With matching
    * bucket counts Catalyst plans this without any Exchange.
    */
  def smbJoin(spark: SparkSession, leftTable: String, rightTable: String,
              leftKeys: Seq[String], rightKeys: Seq[String], how: String = "inner"): DataFrame = {
    val cond = leftKeys.zip(rightKeys)
      .map { case (l, r) => col(l) === col(r) }
      .reduce(_ && _)
    spark.table(leftTable).join(spark.table(rightTable), cond, how)
  }
}
