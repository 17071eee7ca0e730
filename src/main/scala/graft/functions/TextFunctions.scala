package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines.
  * Composed from builtin expressions (no UDFs — no serialization
  * boundary). Caveat that shapes graft.dedup: higher-order functions
  * (transform/aggregate/filter) are interpreted, not codegen'd, and
  * re-evaluate their input expression per element — fine for the
  * single-pass scalar columns here, catastrophic when nested (a
  * column-built MinHash re-tokenizes per hash per band). Hot
  * many-pass pipelines belong in explode+aggregate form (see
  * Dedup.shingleRows/signatures); [[minhashSignature]] and
  * [[simhash64]] remain as the column-level form for small arrays.
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** k-word shingles as strings; a short doc yields its whole text as
    * the single shingle so no row is dropped.
    */
  def wordShingles(toks: Column, k: Int): Column =
    when(size(toks) < k, array(array_join(toks, " ")))
      .otherwise(transform(sequence(lit(0), size(toks) - k),
        i => array_join(slice(toks, i + lit(1), lit(k)), " ")))

  /** xxhash64 of each shingle — the base hash set for MinHash. */
  def shingleHashes(text: Column, k: Int = 3): Column =
    transform(wordShingles(tokens(text), k), s => xxhash64(s))

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min over the doc's shingle hashes. Seeding reuses xxhash64 on
    * the precomputed base hash (cheap long→long mix) instead of
    * re-hashing the string per permutation.
    *
    * Column-level form — pass a MATERIALIZED array column (an
    * attribute, not an inline expression): `baseHashes` is re-evaluated
    * once per permutation. The corpus-scale path is
    * Dedup.signatures (explode + min-aggregates).
    */
  def minhashSignature(baseHashes: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      j => array_min(transform(baseHashes, h => xxhash64(h, j))))

  /** LSH band hashes: signature split into `bands` rows of
    * `rowsPerBand`, each band folded to one long. Docs sharing any
    * band hash become candidate pairs.
    */
  def lshBandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => aggregate(slice(sig, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand)),
        lit(0L), (acc, h) => xxhash64(acc, h)))

  /** 64-bit SimHash over token hashes: bit b of the output is set iff
    * the +1/−1 vote of bit b across all token hashes is positive.
    * Unrolled over literal bit positions so every shift is codegen'd.
    */
  def simhash64(tokenHashes: Column): Column =
    (0 until 64).map { b =>
      val vote = aggregate(tokenHashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === lit(1L), lit(1L)).otherwise(lit(-1L)))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Hamming distance between two 64-bit signatures. */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Overlapping character chunks — the context-window prep step of a
    * training/RAG pipeline (reference analogue: none; scio leaves
    * chunking to user code — graft ships it because every LLM corpus
    * job needs it). Chunk starts are 1, 1+step, 1+2·step, … while the
    * start is inside the text (step = size − overlap), so consecutive
    * chunks share `overlap` characters and the final chunk may be
    * shorter. Empty/null text yields one empty chunk (no row loss —
    * the wordShingles contract). Builtin exprs only: one sequence +
    * substr per row, linear in text length.
    */
  def chunkChars(text: Column, chunkSize: Int, overlap: Int): Column = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val step = chunkSize - overlap
    val t = coalesce(text, lit(""))
    transform(sequence(lit(1), greatest(length(t), lit(1)), lit(step)),
      s => t.substr(s, lit(chunkSize)))
  }

  /** Overlapping whitespace-token chunks of `chunkSize` tokens sharing
    * `overlap` tokens, re-joined with single spaces (the form a
    * tokenizer consumes). Same start/step contract as [[chunkChars]].
    */
  def chunkWords(text: Column, chunkSize: Int, overlap: Int): Column = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val step = chunkSize - overlap
    val toks = tokens(coalesce(text, lit("")))
    transform(sequence(lit(1), greatest(size(toks), lit(1)), lit(step)),
      s => array_join(slice(toks, s, lit(chunkSize)), " "))
  }

  /** Sentence segmentation: maximal runs of non-terminator text with
    * their closing .!? run attached, trimmed, empties dropped. The
    * pattern deliberately avoids lookbehind (java.regex-only) so the
    * exact same text runs in RE2 oracles/tooling — the cost is that
    * abbreviation dots ("e.g.") split like sentence ends, the
    * standard trade of regex segmenters. Null/empty → empty array.
    */
  def sentences(text: Column): Column =
    filter(
      transform(regexp_extract_all(coalesce(text, lit("")),
        lit("[^.!?]+[.!?]*"), lit(0)), s => trim(s)),
      s => s =!= "")

  /** Flesch readability struct — the classic surface-statistics
    * quality signal (reading-ease + Flesch–Kincaid grade) used as a
    * corpus filter/bucketing key alongside the Gopher rules. Counts
    * are the standard regex approximations, all in the java∩RE2
    * shared dialect so the oracle reproduces them verbatim:
    * words = non-empty whitespace tokens; sentences = `[.!?]+` runs,
    * floored at 1; syllables = `[aeiouy]+` vowel-group runs, floored
    * at one per word. Scores are the published formulas
    * (206.835 − 1.015·W/S − 84.6·Syl/W and 0.39·W/S + 11.8·Syl/W −
    * 15.59), 4 dp, null on token-less docs. Pure codegen projection.
    */
  def readability(text: Column): Column = {
    val t = coalesce(text, lit(""))
    val nWords = size(filter(tokens(t), w => length(w) > 0)).cast("long")
    val nSent = greatest(regexp_count(t, lit("[.!?]+")), lit(1)).cast("long")
    val nSyll = greatest(regexp_count(lower(t), lit("[aeiouy]+")), nWords)
    val w = nWords.cast("double")
    val flesch = round(lit(206.835) - lit(1.015) * w / nSent - lit(84.6) * nSyll / w, 4)
    val grade = round(lit(0.39) * w / nSent + lit(11.8) * nSyll / w - lit(15.59), 4)
    struct(
      nWords.as("n_words"), nSent.as("n_sentences"), nSyll.as("n_syllables"),
      when(nWords === 0, lit(null).cast("double")).otherwise(flesch).as("flesch"),
      when(nWords === 0, lit(null).cast("double")).otherwise(grade).as("fk_grade"))
  }

  /** Exact Jaccard similarity of two token/shingle arrays (as sets). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0.0, 0.0).otherwise(inter / uni)
  }

  /** Rolling fingerprint of the token sequence: a left fold chaining
    * xxhash64(acc, token-hash) — order-sensitive (unlike MinHash) so
    * reorderings differ. Chained hashing rather than a polynomial
    * because ANSI mode (Spark 4 default) rejects wrapping multiply.
    */
  def fingerprint(toks: Column): Column =
    aggregate(toks, lit(1469598103934665603L), (acc, t) => xxhash64(acc, xxhash64(t)))

  /** Stopword-profile language ID. For each candidate language,
    * scores the fraction of tokens that are among its most frequent
    * stopwords (plus a CJK character-range check, since Chinese is not
    * whitespace-tokenized); returns the argmax language code.
    * Composed entirely of builtin array expressions.
    */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val nTok = greatest(size(toks), lit(1)).cast("double")
    def score(stops: Seq[String]): Column =
      size(filter(toks, t => t.isin(stops: _*))).cast("double") / nTok
    val cjkRatio =
      (length(text) - length(regexp_replace(text, "[\\u4e00-\\u9fff]", ""))).cast("double") /
        greatest(length(text), lit(1)).cast("double")
    val scored = map(
      lit("en"), score(LangProfiles.en),
      lit("es"), score(LangProfiles.es),
      lit("de"), score(LangProfiles.de),
      lit("fr"), score(LangProfiles.fr),
      lit("zh"), cjkRatio * 2.0)
    // argmax over the map: reduce entries, keep best (ties → first).
    aggregate(map_entries(scored),
      struct(lit("und").as("lang"), lit(0.005).as("s")),
      (best, e) => when(e.getField("value") > best.getField("s"),
        struct(e.getField("key").as("lang"), e.getField("value").as("s"))).otherwise(best)
    ).getField("lang")
  }

  /** Quality-score components: length, token count, type/token ratio,
    * mean token length, alpha ratio, and a composite score in [0,1].
    */
  def qualityStruct(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val nChar = length(text).cast("double")
    val distinctRatio = size(array_distinct(toks)).cast("double") / greatest(nTok, lit(1.0))
    val meanTokLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(nTok, lit(1.0))
    val alphaRatio = length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double") /
      greatest(nChar, lit(1.0))
    val lengthOk = when(nTok >= 10 && nTok <= 100000, 1.0).otherwise(0.0)
    val score = (least(distinctRatio * 2.0, lit(1.0)) + alphaRatio + lengthOk) / lit(3.0)
    struct(nTok.cast("long").as("n_tokens"), distinctRatio.as("distinct_ratio"),
      meanTokLen.as("mean_tok_len"), alphaRatio.as("alpha_ratio"), score.as("quality"))
  }

  /** Whitespace token count plus a BPE-ish subword estimate
    * (≈ ceil(len/4) pieces per word — the standard ~4 chars/token
    * heuristic).
    */
  def tokenCounts(text: Column): Column = {
    val toks = tokens(text)
    struct(size(toks).cast("long").as("n_ws_tokens"),
      aggregate(toks, lit(0L), (acc, t) => acc + ceil(length(t) / lit(4.0)).cast("long"))
        .as("n_bpe_est"))
  }
}

/** Top stopwords per language (public knowledge, standard lists). */
private[graft] object LangProfiles {
  val en = Seq("the", "of", "and", "to", "in", "a", "is", "that", "it", "was",
    "for", "on", "are", "as", "with", "his", "they", "at", "be", "this")
  val es = Seq("de", "la", "que", "el", "en", "y", "a", "los", "del", "se",
    "las", "por", "un", "para", "con", "una", "su", "al", "es", "lo")
  val de = Seq("der", "die", "und", "in", "den", "von", "zu", "das", "mit",
    "sich", "des", "auf", "für", "ist", "im", "dem", "nicht", "ein", "eine", "als")
  val fr = Seq("de", "la", "le", "et", "les", "des", "en", "un", "du", "une",
    "que", "est", "pour", "qui", "dans", "a", "par", "plus", "pas", "au")
}
