package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lake-table maintenance: MERGE-style upsert, CDC batch apply, and
  * SCD Type 2 history building — the write-side verbs scio pipelines
  * hand-roll from join/groupBy before a Beam IO sink (reference shape:
  * scio-examples joins + saveAs*; the semantics here are the standard
  * Delta/Iceberg MERGE INTO contract, re-expressed as pure
  * Dataset→Dataset transforms over snapshot tables).
  *
  * Scale shape: every verb is ONE anti/outer join plus a union — the
  * matched side is a key projection, so the shuffle carries keys, not
  * payloads, and a dimension-sized `updates` side broadcasts under
  * AQE. Nothing collects; nothing loops.
  */
object Merge {

  private def checkColumns(target: DataFrame, source: DataFrame, keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "merge needs at least one key column")
    val t = target.columns.toSet
    val s = source.columns.toSet
    keys.foreach { k =>
      require(t.contains(k) && s.contains(k), s"key column $k must exist on both sides")
    }
  }

  /** Fail if `source` carries more than one row per key — the MERGE
    * contract (a multi-matched key would make the result depend on
    * row order). One partial-agg count over the key projection.
    */
  private def requireUniqueKeys(source: DataFrame, keys: Seq[String], verb: String): Unit = {
    val dup = source.groupBy(keys.map(col): _*).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"$verb requires source rows unique per key; found duplicate key " +
        dup.headOption.map(_.toSeq.init.mkString("(", ",", ")")).orNull)
  }

  /** MERGE upsert: rows of `updates` replace target rows with the same
    * key; unmatched update rows append. Both frames must share the
    * target's schema (matched by name). `updates` must be unique per
    * key (checked unless `assumeUniqueUpdates`).
    */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String],
             assumeUniqueUpdates: Boolean = false): DataFrame = {
    checkColumns(target, updates, keys)
    if (!assumeUniqueUpdates) requireUniqueKeys(updates, keys, "upsert")
    // anti join against the key PROJECTION: the shuffle/broadcast side
    // carries keys only, never update payloads
    val updateKeys = updates.select(keys.map(col): _*)
    target.join(updateKeys, keys, "left_anti")
      .unionByName(updates.select(target.columns.map(col): _*))
  }

  /** Apply a CDC change batch to a snapshot: `changes` carries the
    * target's columns plus a monotone sequence column `seqCol` and an
    * operation column `opCol` with values "I"/"U" (upsert) and "D"
    * (delete). Per key, only the HIGHEST-sequence change applies
    * (earlier changes in the same batch are superseded); ties on
    * (seq) break lexicographically on (op, payload) so the result
    * never depends on row order.
    */
  def applyCdc(target: DataFrame, changes: DataFrame, keys: Seq[String],
               seqCol: String, opCol: String): DataFrame = {
    checkColumns(target, changes, keys)
    require(!target.columns.contains(seqCol) && !target.columns.contains(opCol),
      s"target must not already carry $seqCol/$opCol")
    val payload = target.columns.filterNot(keys.contains)
    // latest change per key as ONE lexicographic max_by struct — a
    // deterministic partial-aggregating reduction, not a window sort
    val latest = changes
      .groupBy(keys.map(col): _*)
      .agg(max(struct((Seq(seqCol, opCol) ++ payload).map(col): _*)).as("__c"))
      .select(keys.map(col) ++ Seq(col(s"__c.$opCol").as(opCol)) ++
        payload.map(p => col(s"__c.$p").as(p)): _*)
    val untouched = target.join(latest.select(keys.map(col): _*), keys, "left_anti")
    untouched.unionByName(
      latest.filter(col(opCol) =!= "D").select(target.columns.map(col): _*))
  }

  /** SCD Type 2 history from a change log: rows (key…, ts, attrs…)
    * become versioned dimension rows with `valid_from`, `valid_to`
    * (exclusive; null = open) and `is_current`. Consecutive rows with
    * identical attrs collapse into one validity span when
    * `compressRuns` (the usual SCD2 contract — re-stating the same
    * value is not a new version). Ties on `tsCol` within a key break
    * lexicographically on the attrs, so input order never matters.
    *
    * One window shuffle (partition by key, order by ts) serves both
    * the run-compression lag and the valid_to lead.
    */
  def scd2(changeLog: DataFrame, keys: Seq[String], tsCol: String,
           compressRuns: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "scd2 needs at least one key column")
    val attrs = changeLog.columns.filterNot(c => keys.contains(c) || c == tsCol)
    require(attrs.nonEmpty, "scd2 needs at least one attribute column besides keys and ts")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol) +: attrs.map(col): _*)
    val attrStruct = struct(attrs.map(col): _*)
    val changed = changeLog.withColumn("__prev", lag(attrStruct, 1).over(w))
    val versions =
      if (compressRuns)
        changed.filter(col("__prev").isNull || col("__prev") =!= attrStruct)
      else changed
    // lead over the SAME window key/order: the filter above preserves
    // the per-key ordering, so one more pass on the same partitioning
    versions
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__prev", tsCol)
  }
}
