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

  /** Windowed collocation statistics (PMI): ordered token pairs
    * (t1 before t2, gap <= `window`) with
    * pmi = ln(p(t1,t2) / (p1(t1) · p2(t2))), marginals taken over the
    * pair slots themselves so probabilities are consistent by
    * construction. Pairs with fewer than `minCount` occurrences are
    * pruned BEFORE the marginal joins (hapax pairs dominate the pair
    * space and carry no usable signal).
    *
    * Scale shape: pair generation is IN-TASK — `window` shifted
    * zip_with slices per doc, linear in tokens·window, never a
    * positional self-join (which re-shuffles every token row and goes
    * quadratic per doc) — then one hash aggregation over pair rows,
    * vocabulary-sized marginal folds of those same counts, and
    * AQE-broadcast joins back. Returns (t1, t2, n_pairs, pmi).
    */
  def collocations(df: DataFrame, idCol: String, textCol: String,
                   window: Int = 3, minCount: Long = 5L): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val toks = TextFunctions.tokens(coalesce(col(textCol), lit("")))
    val pairRows = df
      .select(toks.as("__t"))
      .select(explode(flatten(transform(sequence(lit(1), lit(window)), d =>
        zip_with(slice(col("__t"), lit(1), size(col("__t")) - d),
          slice(col("__t"), d + lit(1), size(col("__t")) - d),
          (a, b) => struct(a.as("t1"), b.as("t2")))))).as("p"))
      .select(col("p.t1"), col("p.t2"))
      .filter(length(col("t1")) > 0 && length(col("t2")) > 0)
    val pairCounts = pairRows.groupBy(col("t1"), col("t2"))
      .agg(count(lit(1)).as("n_pairs"))
      .persist()
    val left = pairCounts.groupBy(col("t1")).agg(sum(col("n_pairs")).as("__c1"))
    val right = pairCounts.groupBy(col("t2")).agg(sum(col("n_pairs")).as("__c2"))
    val total = pairCounts.agg(sum(col("n_pairs"))).collect()(0).getLong(0)
    pairCounts
      .filter(col("n_pairs") >= minCount)
      .join(left, Seq("t1"))
      .join(right, Seq("t2"))
      .select(col("t1"), col("t2"), col("n_pairs"),
        log(col("n_pairs").cast("double") * total.toDouble /
          (col("__c1").cast("double") * col("__c2").cast("double"))).as("pmi"))
  }
}
