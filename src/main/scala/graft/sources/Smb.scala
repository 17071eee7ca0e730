package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{array, coalesce, col, collect_list, struct}

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

  /** N-way join of co-bucketed tables on the shared bucket key —
    * graft's counterpart to scio-smb's multi-source reads
    * (scio-smb/src/main/scala/com/spotify/scio/smb/util/SMBMultiJoin
    * .scala, sortMergeJoin up to 22 sources). `inputs` is
    * (tableName, keyCols) per source, joined left-to-right; with
    * matching bucket counts every sort-merge join in the chain plans
    * without an Exchange, so an arbitrarily wide join moves zero rows
    * over the network (asserted in SmbSpec).
    */
  def smbJoinMulti(spark: SparkSession, inputs: Seq[(String, Seq[String])],
                   how: String = "inner"): DataFrame = {
    require(inputs.size >= 2, s"smbJoinMulti needs at least 2 tables, got ${inputs.size}")
    val arity = inputs.head._2.size
    require(inputs.forall(_._2.size == arity), "all key lists must share one arity")
    inputs.tail.foldLeft(spark.table(inputs.head._1) -> inputs.head._2) {
      case ((acc, accKeys), (table, keys)) =>
        val cond = accKeys.zip(keys).map { case (l, r) => col(l) === col(r) }.reduce(_ && _)
        acc.join(spark.table(table), cond, how) -> accKeys
    }._1
  }

  /** N-way cogroup of co-bucketed tables — scio-smb's CoGbk read shape
    * (scio-smb SortedBucketIO.java CoGbk; scio-smb package.scala
    * sortMergeCoGroup): one row per key carrying, per source, the
    * array of that source's rows (non-key columns as a struct, in
    * bucket-file sort order). Missing keys yield EMPTY arrays, never
    * nulls, matching the reference's empty-Iterable contract. Each
    * per-source grouping aggregates on the bucket key (no Exchange —
    * bucketing already satisfies the distribution) and the outer full
    * joins are co-bucketed sort-merge joins, so the whole cogroup is
    * shuffle-free (asserted in SmbSpec).
    */
  def smbCogroup(spark: SparkSession, inputs: Seq[(String, Seq[String])],
                 outKeys: Seq[String]): DataFrame = {
    require(inputs.size >= 2, s"smbCogroup needs at least 2 tables, got ${inputs.size}")
    val arity = outKeys.size
    require(arity >= 1 && inputs.forall(_._2.size == arity),
      "outKeys and every key list must share one non-empty arity")
    val grouped = inputs.zipWithIndex.map { case ((table, keys), idx) =>
      val df = spark.table(table)
      val payload = df.columns.filterNot(keys.contains)
      require(payload.nonEmpty, s"$table has no non-key columns to cogroup")
      val rowsCol = s"${table}_rows"
      // rename each source's keys to per-source names BEFORE the fold:
      // SMB tables routinely share key names (every side keyed
      // "user_id"), and unqualified equi-conditions on a shared name
      // are ambiguous after the join
      val renamed = keys.zipWithIndex.map { case (_, i) => s"__cg_src${idx}_$i" }
      val agg = df.groupBy(keys.map(col): _*)
        .agg(collect_list(struct(payload.map(col): _*)).as(rowsCol))
      val unique = keys.zip(renamed).foldLeft(agg) {
        case (d, (k, nk)) => d.withColumnRenamed(k, nk)
      }
      (unique, renamed, rowsCol)
    }
    // After each full-outer join, carry forward COALESCED key columns
    // and join subsequent sources against those: a key absent from the
    // first source but present in two later ones must still collapse
    // to one row (CoGbk contract) — joining on the first source's key
    // alone would leave it null === key forever (3-way test in SmbSpec).
    val joined = grouped.tail.foldLeft(
      grouped.head._1 -> grouped.head._2.toList) {
      case ((acc, accKeys), (df, keys, _)) =>
        val cond = accKeys.zip(keys).map { case (l, r) => col(l) === col(r) }.reduce(_ && _)
        val j = acc.join(df, cond, "full_outer")
        val mergedKeys = (0 until arity).map(i => s"__cg_key_$i").toList
        val proj = accKeys.zip(keys).zipWithIndex.map { case ((l, r), i) =>
            coalesce(col(l), col(r)).as(mergedKeys(i)) } ++
          j.columns.filterNot(c => accKeys.contains(c) || keys.contains(c)).map(col)
        j.select(proj: _*) -> mergedKeys
    }._1
    // surface one key column set (already coalesced across sources) and
    // one never-null rows array per source
    val keyCols: Seq[Column] = (0 until arity).map { i =>
      col(s"__cg_key_$i").as(outKeys(i))
    }
    val rowCols = grouped.map { case (_, _, rowsCol) =>
      coalesce(col(rowsCol), array()).as(rowsCol)
    }
    joined.select(keyCols ++ rowCols: _*)
  }

  /** Write an ALREADY key-aligned frame as a bucketed+sorted table
    * without the repartition [[writeBucketed]] pays: the bucketed
    * writer needs no particular distribution (it routes each row to
    * its bucket file within the task), so a frame derived from
    * co-bucketed scans with the key values preserved writes exactly
    * one file per bucket with zero Exchange — Spark's hash bucketing
    * is value-determined, so input bucket i's keys land in output
    * bucket i. If the input is NOT aligned the result is still a
    * correct bucketed table (up to tasks × buckets files), just not a
    * single-file-per-bucket layout.
    */
  def writeBucketedAligned(df: DataFrame, table: String, path: String, buckets: Int,
                           bucketCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val sort = if (sortCols.nonEmpty) sortCols else bucketCols
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sort.head, sort.tail: _*)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)
  }

  /** scio-smb's SortMergeTransform (scio-smb/src/main/scala/com/
    * spotify/scio/smb/SortMergeTransform.scala; SortedBucketTransform
    * .java): read co-bucketed inputs, transform, and write the result
    * bucketed on the same key — end to end with NO shuffle, because
    * the join is co-bucketed and the write is [[writeBucketedAligned]].
    * `f` must preserve the rows' bucket-key VALUES (it may rename the
    * columns; `bucketCols` names columns of f's output). The output is
    * itself a valid SMB table: future smbJoins against any co-bucketed
    * table stay exchange-free (asserted in SmbSpec).
    */
  def smbTransform(spark: SparkSession, inputs: Seq[(String, Seq[String])],
                   how: String = "inner")(f: DataFrame => DataFrame)(
                   outTable: String, outPath: String, buckets: Int,
                   bucketCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val joined =
      if (inputs.size == 1) spark.table(inputs.head._1)
      else smbJoinMulti(spark, inputs, how)
    writeBucketedAligned(f(joined), outTable, outPath, buckets, bucketCols, sortCols)
  }
}
