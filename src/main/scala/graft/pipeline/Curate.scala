package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.TextFunctions.{qualityStruct, tokenCounts}

/** End-to-end training-data curation — the composition the library
  * exists for, wired from its own operators:
  *
  *   (optional) PII redaction → (optional) line-level dedup →
  *   quality gate → (optional) repetition gate → exact content dedup →
  *   (optional) MinHash near-dup dedup → (optional) substring-
  *   duplication gate → (optional) benchmark decontamination →
  *   token accounting → (optional) split assignment
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
    * @param maxDupGramFrac  drop docs whose repeated-n-gram occurrence
    *                   fraction exceeds this (Gopher-style repetition
    *                   gate via [[graft.functions.TextMetrics.repetition]]);
    *                   None → no repetition gate.
    * @param repetitionN n-gram width for the repetition gate.
    * @param benchmark  eval/benchmark texts to decontaminate against
    *                   ([[graft.dedup.Dedup.decontaminate]], applied
    *                   LAST so the shipped corpus is clean); None → off.
    * @param benchTextCol text column in `benchmark`.
    * @param decontamK  shingle width for decontamination overlap.
    * @param decontamExcise  decontaminate by EXCISION instead of
    *                   dropping: bench-overlapping spans are cut out
    *                   ([[graft.dedup.Dedup.decontaminateSpans]]) and
    *                   the shortened doc ships; token accounting
    *                   downstream reflects the rewritten text.
    * @param redactPii  rewrite the text through
    *                   [[graft.functions.TextClean.redactPii]] FIRST,
    *                   so every downstream hash/shingle sees the
    *                   redacted form (two near-identical docs that
    *                   differ only in embedded PII dedup together).
    * @param lineDedupMaxOcc  drop corpus-duplicated lines (C4-style
    *                   boilerplate removal, [[graft.dedup.Dedup
    *                   .dedupLines]]) before quality scoring; None → off.
    * @param removeDupSpansK  REWRITE each doc by excising non-first
    *                   occurrences of corpus-duplicated k-grams
    *                   ([[graft.dedup.Dedup.removeDuplicateSpans]],
    *                   Lee et al. substring dedup) before quality
    *                   scoring — the transform sibling of the
    *                   maxSubstrDupFrac FILTER; Some(k) → on with
    *                   that gram width, None → off.
    * @param maxSubstrDupFrac  drop docs whose duplicated-substring
    *                   coverage ([[graft.dedup.Dedup.substringStats]]
    *                   `dup_fraction`) exceeds this; None → off.
    * @param substrK    k-gram width for the substring gate.
    * @param split      append a deterministic `split` label column
    *                   ([[graft.operators.Splits.assignSplit]]) as
    *                   (weights, seed); None → no column.
    * @param gopherRules also require the full Gopher rule battery
    *                   ([[graft.functions.QualityRules.gopherStruct]]
    *                   `keep`) — pure per-row, rides the same scan as
    *                   the quality gate.
    * @param maxAvgNll  drop docs whose corpus-LM score
    *                   ([[graft.functions.LmScore.unigram]] `avg_nll`)
    *                   exceeds this (the CCNet tail trim — spam/
    *                   gibberish/wrong-language score high); token-less
    *                   docs carry a null score and are KEPT by this
    *                   gate (the token gate owns them); None → off.
    * @param extractHtml  treat the text column as raw HTML: extract
    *                   density-scored main content and decode
    *                   entities FIRST ([[graft.functions.TextClean
    *                   .extractMainContent]] → [[graft.functions
    *                   .TextClean.stripHtml]]), so every later stage
    *                   sees prose.
    * @param foldHomoglyphs  fold cross-script confusables to Latin
    *                   ([[graft.functions.TextClean.foldHomoglyphs]])
    *                   before any stage hashes, so homoglyph-evasive
    *                   near-copies dedup together.
    * @param normalizeUnicode  NFC-normalize the text BEFORE any stage
    *                   hashes it ([[graft.functions.TextClean.nfc]]),
    *                   so precomposed and decomposed renditions of the
    *                   same text dedup together; runs even before PII
    *                   redaction (patterns then see canonical forms).
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             minTokens: Long = 10L, minAlpha: Double = 0.5,
             nearDup: Boolean = true,
             maxDupGramFrac: Option[Double] = None, repetitionN: Int = 2,
             benchmark: Option[DataFrame] = None, benchTextCol: String = "text",
             decontamK: Int = 13, decontamExcise: Boolean = false,
             redactPii: Boolean = false,
             lineDedupMaxOcc: Option[Long] = None,
             removeDupSpansK: Option[Int] = None,
             maxSubstrDupFrac: Option[Double] = None, substrK: Int = 8,
             split: Option[(Seq[(String, Double)], String)] = None,
             gopherRules: Boolean = false,
             maxAvgNll: Option[Double] = None,
             normalizeUnicode: Boolean = false,
             foldHomoglyphs: Boolean = false,
             extractHtml: Boolean = false): DataFrame = {
    // raw HTML in: density-scored main-content extraction, then
    // entity decode via the strip chain — BEFORE any other stage so
    // hashes/gates see prose, not markup
    val docs0 =
      if (!extractHtml) docs
      else docs.withColumn(textCol,
        graft.functions.TextClean.stripHtml(
          graft.functions.TextClean.extractMainContent(col(textCol))))
    // Unicode NFC before anything hashes: precomposed vs decomposed
    // renditions of the same text must dedup together (native codegen
    // expression, ASCII rows untouched without allocation)
    val canonical0 =
      if (!normalizeUnicode) docs0
      else docs0.withColumn(textCol,
        graft.functions.TextClean.nfc(col(textCol)))
    // cross-script confusables fold AFTER NFC (canonical forms) and
    // BEFORE anything hashes, for the same reason: evasive renditions
    // of the same text must dedup together
    val canonical =
      if (!foldHomoglyphs) canonical0
      else canonical0.withColumn(textCol,
        graft.functions.TextClean.foldHomoglyphs(col(textCol)))
    val redacted =
      if (!redactPii) canonical
      else canonical.withColumn(textCol,
        graft.functions.TextClean.redactPii(col(textCol)))
    val lined = lineDedupMaxOcc match {
      case Some(maxOcc) =>
        // dedupLines rebuilds text on (id, text) only; join the
        // rebuilt text back onto the full row (other columns survive)
        val rebuilt = Dedup.dedupLines(redacted, idCol, textCol, maxOcc)
          .select(col("id").as("__ld_id"), col("text").as("__ld_text"))
        redacted.drop(textCol)
          .join(rebuilt, col(idCol) === col("__ld_id"))
          .withColumn(textCol, col("__ld_text"))
          .drop("__ld_id", "__ld_text")
      case None => redacted
    }
    val spanned = removeDupSpansK match {
      case Some(k) =>
        // text rewrite, same join-back shape as the line-dedup stage;
        // the rewriter reads its input twice (gram pass + rebuild
        // pass) — persist it like the other fan-out stages
        val shared = lined.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val rebuilt = Dedup.removeDuplicateSpans(shared, idCol, textCol, k)
          .select(col("id").as("__rs_id"), col("clean_text").as("__rs_text"))
        shared.drop(textCol)
          .join(rebuilt, col(idCol) === col("__rs_id"))
          .withColumn(textCol, col("__rs_text"))
          .drop("__rs_id", "__rs_text")
      case None => lined
    }
    val q = qualityStruct(col(textCol))
    val qualityGated0 = spanned
      .withColumn("__q", q)
      .filter(col("__q").getField("n_tokens") >= minTokens &&
        col("__q").getField("alpha_ratio") >= minAlpha)
      .drop("__q")
    val qualityGated =
      if (!gopherRules) qualityGated0
      else qualityGated0.filter(
        graft.functions.QualityRules.gopherStruct(col(textCol)).getField("keep"))
    // each optional stage that fans its input out to two subtrees
    // (metric side + kept side) persists that input first — the same
    // double-planning guard as the near-dup stage below
    val scored = maxDupGramFrac match {
      case Some(t) =>
        val shared = qualityGated.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val calm = graft.functions.TextMetrics.repetition(shared, idCol, textCol, repetitionN)
          .filter(col("dup_gram_frac") <= t).select(col(idCol))
        shared.join(calm, Seq(idCol), "left_semi")
      case None => qualityGated
    }
    // CCNet-style corpus-LM tail trim: the model trains on the gated
    // corpus itself, so the gate needs the shared frame twice
    val lmGated = maxAvgNll match {
      case Some(t) =>
        val shared = scored.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val ok = graft.functions.LmScore.unigram(shared, idCol, textCol)
          .filter(col("avg_nll").isNull || col("avg_nll") <= t)
          .select(col("id").as(idCol))
        shared.join(ok, Seq(idCol), "left_semi")
      case None => scored
    }
    // exact dedup: keep the deterministic keeper (min id) per content —
    // window-min over the content hash, not Dedup.exact + join-back
    // (the join form re-plans the quality-filtered scan for both sides)
    val byContent = Window.partitionBy(md5(coalesce(col(textCol), lit(""))))
    val exactDeduped = lmGated
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
    val calmed = maxSubstrDupFrac match {
      case Some(t) =>
        val shared = deduped.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val keep = Dedup.substringStats(shared, idCol, textCol, substrK)
          .filter(col("dup_fraction") <= t).select(col("id").as(idCol))
        shared.join(keep, Seq(idCol), "left_semi")
      case None => deduped
    }
    val clean = benchmark match {
      case Some(b) if decontamExcise =>
        // excision mode: rewrite instead of drop — bench-overlapping
        // spans are cut out and the (possibly shortened) doc ships
        val shared = calmed.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val rebuilt = Dedup.decontaminateSpans(shared, idCol, textCol,
            b, benchTextCol, decontamK)
          .select(col("id").as("__dx_id"), col("clean_text").as("__dx_text"))
        shared.drop(textCol)
          .join(rebuilt, col(idCol) === col("__dx_id"))
          .withColumn(textCol, col("__dx_text"))
          .drop("__dx_id", "__dx_text")
      case Some(b) =>
        val shared = calmed.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        Dedup.decontaminate(shared, idCol, textCol, b, benchTextCol, decontamK)
          .filter(!col("contaminated")).drop("contaminated")
      case None => calmed
    }
    val tc = tokenCounts(col(textCol))
    val counted = clean
      .withColumn("__tc", tc)
      .withColumn("n_tokens", col("__tc").getField("n_ws_tokens"))
      .withColumn("n_bpe_est", col("__tc").getField("n_bpe_est"))
      .drop("__tc")
    split match {
      case Some((weights, seed)) =>
        graft.operators.Splits.assignSplit(counted, idCol, weights, seed)
      case None => counted
    }
  }
}
