package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Document-level rule-based quality filtering — the Gopher rule
  * battery (Rae et al. 2021, "Scaling Language Models", App. A1.1;
  * the same rules C4/RefinedWeb/Dolma variants start from). The
  * reference leaves this to user code over scio's map/filter; graft
  * ships it as one struct because every web-scale corpus job runs
  * some version of these rules before anything else touches the data.
  *
  * Scale shape: pure per-row builtin expressions (split/filter/
  * aggregate over the token and line arrays — single-pass HOF uses
  * per the SURVEY §4 rule), no UDF, no shuffle; the filter that
  * consumes `keep` pushes to the scan like any other predicate.
  *
  * Null/empty contract: null text behaves as "" — zero words, so the
  * word-count rule fails and `keep` is false (no row is dropped by
  * the operator itself; dropping is the caller's filter).
  */
object QualityRules {

  /** The eight required stopwords of the Gopher rule ("contain at
    * least two of ...").
    */
  val gopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document rule signals + the composite `keep` flag:
    * n_words, mean_word_len, symbol_ratio (# and ellipsis per word),
    * bullet_ratio / ellipsis_ratio (fraction of lines starting with a
    * bullet / ending with an ellipsis), alpha_ratio (words containing
    * an alphabetic char), stop_hits (distinct required stopwords
    * present), keep.
    *
    * Published thresholds: 50 ≤ words ≤ 100000; 3 ≤ mean word len
    * ≤ 10; symbol ratio < 0.1; ≤ 90% bullet lines; ≤ 30% ellipsis
    * lines; ≥ 80% alpha words; ≥ 2 stopwords.
    */
  def gopherStruct(text: Column): Column = {
    val t = coalesce(text, lit(""))
    val words = filter(split(trim(t), "\\s+"), w => length(w) > 0)
    val nW = size(words).cast("double")
    val nWSafe = greatest(nW, lit(1.0))
    val meanLen = aggregate(words, lit(0L), (acc, w) => acc + length(w))
      .cast("double") / nWSafe
    // '#' characters plus non-overlapping "..." runs plus '…' chars
    val nHash = (length(t) - length(replace(t, lit("#"), lit("")))).cast("double")
    val nDots = ((length(t) - length(replace(t, lit("..."), lit("")))) / 3).cast("double")
    val nUni = (length(t) - length(replace(t, lit("…"), lit("")))).cast("double")
    val symbolRatio = (nHash + nDots + nUni) / nWSafe
    val lines = filter(transform(split(t, "\n"), l => trim(l)), l => length(l) > 0)
    val nL = greatest(size(lines), lit(1)).cast("double")
    val bulletRatio = size(filter(lines, l =>
      l.startsWith("•") || l.startsWith("- ") || l.startsWith("* "))).cast("double") / nL
    val ellipsisRatio = size(filter(lines, l =>
      l.endsWith("...") || l.endsWith("…"))).cast("double") / nL
    val alphaRatio = size(filter(words, w => w.rlike("[a-zA-Z]"))).cast("double") / nWSafe
    val stopHits = size(array_intersect(
      array_distinct(transform(words, w => lower(w))),
      array(gopherStops.map(lit(_)): _*))).cast("long")
    val keep = nW >= 50.0 && nW <= 100000.0 &&
      meanLen >= 3.0 && meanLen <= 10.0 &&
      symbolRatio < 0.1 &&
      bulletRatio <= 0.9 && ellipsisRatio <= 0.3 &&
      alphaRatio >= 0.8 &&
      stopHits >= 2L
    struct(
      nW.cast("long").as("n_words"),
      meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"),
      bulletRatio.as("bullet_ratio"),
      ellipsisRatio.as("ellipsis_ratio"),
      alphaRatio.as("alpha_ratio"),
      stopHits.as("stop_hits"),
      keep.as("keep"))
  }
}
