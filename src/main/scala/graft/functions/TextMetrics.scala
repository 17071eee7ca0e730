package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frame-level text-quality metrics that need a per-document
  * aggregation over exploded grams (vs the single-pass scalar columns
  * in [[TextFunctions]]). The motivating consumer is Gopher-style
  * repetition filtering: documents dominated by a few repeated n-grams
  * are boilerplate/spam and get dropped before training.
  */
object TextMetrics {

  /** Within-document repetition signals over word n-grams, per doc:
    *
    *  - `n_grams` / `distinct_grams`: total and distinct n-gram counts;
    *  - `dup_gram_frac`: fraction of n-gram occurrences whose gram
    *    appears more than once in the doc (0 = no repetition, → 1 as
    *    the doc collapses to repeated phrases);
    *  - `top_gram_frac`: occurrence share of the single most frequent
    *    n-gram — the "fraction of text in the most common n-gram"
    *    signal.
    *
    * Execution shape (the reason this is frame-level, not a
    * higher-order-function column): grams explode to rows once via
    * [[graft.dedup.Dedup.shingleRows]] (narrow, no shuffle), then two
    * hash aggregations — (id, gram-hash) counts, then per-id moments —
    * both with map-side partials. A column-level HOF form would
    * re-scan the gram array per distinct gram: O(len²) per doc, and
    * interpreted. Gram identity is the 64-bit shingle hash; a doc
    * shorter than n tokens is its own single gram (metrics come out
    * 1/1/0/1, consistent with "nothing repeated").
    */
  def repetition(df: DataFrame, idCol: String, textCol: String, n: Int = 2): DataFrame = {
    val gramCounts = graft.dedup.Dedup.shingleRows(df, idCol, textCol, n)
      .groupBy(col("id"), col("h")).agg(count(lit(1)).as("c"))
    gramCounts.groupBy(col("id").as(idCol))
      .agg(
        sum(col("c")).as("n_grams"),
        count(lit(1)).as("distinct_grams"),
        (sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).cast("double") /
          sum(col("c")).cast("double")).as("dup_gram_frac"),
        (max(col("c")).cast("double") / sum(col("c")).cast("double")).as("top_gram_frac"))
  }
}
