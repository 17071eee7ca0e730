package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.TextFunctions.{qualityStruct, tokenCounts}

/** End-to-end training-data curation — the composition the library
  * exists for, wired from its own operators:
  *
  *   quality gate → exact content dedup → (optional) MinHash near-dup
  *   dedup → token accounting
  *
  * Every stage is declarative, so Catalyst plans the whole pipeline as
  * one DAG: the quality filter pushes onto the scan, exact dedup is a
  * single window-min over the content hash (one scan, one shuffle —
  * the keeper-set join form would re-plan the scan and shuffle twice;
  * same reasoning as Dedup.minhashClusters' bucket-min window), and
  * token accounting rides the final projection. The near-dup stage
  * adds the capped LSH linking plus one semi join back against the
  * representative ids (see [[graft.dedup.Dedup.minhashClusters]]).
  *
  * Output shards go to TFRecord/parquet via [[graft.sources]]; see
  * TrainingPipelineSpec for the full read→curate→write exercise.
  */
object Curate {

  /** Curate a document corpus. Returns the surviving rows plus
    * `n_tokens` / `n_bpe_est` accounting columns.
    *
    * @param minTokens  minimum whitespace-token count (quality gate)
    * @param minAlpha   minimum alphabetic-character ratio (quality gate)
    * @param nearDup    also drop MinHash near-duplicates (keeps each
    *                   cluster's representative). Off → exact dedup only.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             minTokens: Long = 10L, minAlpha: Double = 0.5,
             nearDup: Boolean = true): DataFrame = {
    val q = qualityStruct(col(textCol))
    val scored = docs
      .withColumn("__q", q)
      .filter(col("__q").getField("n_tokens") >= minTokens &&
        col("__q").getField("alpha_ratio") >= minAlpha)
      .drop("__q")
    // exact dedup: keep the deterministic keeper (min id) per content —
    // window-min over the content hash, not Dedup.exact + join-back
    // (the join form re-plans the quality-filtered scan for both sides)
    val byContent = Window.partitionBy(md5(coalesce(col(textCol), lit(""))))
    val exactDeduped = scored
      .withColumn("__keeper", min(col(idCol)).over(byContent))
      .filter(col("__keeper") === col(idCol))
      .drop("__keeper")
    val deduped =
      if (!nearDup) exactDeduped
      else {
        // exactDeduped feeds BOTH minhashClusters and the semi join's
        // left side; without a persist the scan + quality gate +
        // content-hash window would execute twice. Persisted lazily
        // (spark evicts LRU; a one-shot pipeline run never unpersists).
        val shared = exactDeduped.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val reps = Dedup.minhashClusters(shared, idCol, textCol)
          .filter(col("keep")).select(col("id").as(idCol))
        shared.join(reps, Seq(idCol), "left_semi")
      }
    val tc = tokenCounts(col(textCol))
    deduped
      .withColumn("__tc", tc)
      .withColumn("n_tokens", col("__tc").getField("n_ws_tokens"))
      .withColumn("n_bpe_est", col("__tc").getField("n_bpe_est"))
      .drop("__tc")
  }
}
