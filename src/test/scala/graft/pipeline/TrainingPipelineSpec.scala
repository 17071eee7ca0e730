package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The full curation pipeline (quality → exact dedup → MinHash
  * near-dup → token accounting → TFRecord shards), end to end on real
  * documents — the composition a training-data user runs.
  */
class TrainingPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("curate: quality-gated, content-unique, near-dup-free, token-accounted") {
    val curated = Curate.curate(docs, "doc_id", "text",
      minTokens = 10L, minAlpha = 0.5, nearDup = true).cache()
    try {
      val n = curated.count()
      assert(n > 0 && n < docs.count(), s"curation should drop something: $n of ${docs.count()}")
      // no two survivors share content
      assert(curated.groupBy(md5(coalesce(col("text"), lit("")))).count()
        .filter(col("count") > 1).count() == 0L)
      // near-dup stage keeps only cluster representatives. Small-corpus
      // property: with hot-bucket caps disengaged (every bucket far
      // below maxBucket at this scale) a re-run over the survivors
      // must find nothing left to link; on a corpus with degenerate
      // buckets the caps make this intentionally non-invariant.
      val reps = graft.dedup.Dedup.minhashClusters(curated, "doc_id", "text")
      assert(reps.filter(!col("keep")).count() == 0L)
      // quality gate held
      assert(curated.filter(col("n_tokens") < 10).count() == 0L)
      // accounting columns populated and positive
      assert(curated.filter(col("n_bpe_est") <= 0 || col("n_tokens") <= 0).count() == 0L)
    } finally curated.unpersist()
  }

  test("curate: repetition gate and benchmark decontamination stages") {
    val corpus = Seq(
      (1L, "red orange yellow green blue indigo violet cyan magenta white black grey"),
      (2L, "spam spam spam spam spam spam spam spam spam spam spam spam"), // repetition-gated
      (3L, "one two three four five six seven eight nine ten eleven twelve"),
      (4L, "held out question alpha beta gamma delta epsilon answer text here") // contaminated
    ).toDF("doc_id", "text")
    val bench = Seq("the eval asks question alpha beta gamma delta epsilon answer")
      .toDF("bench_text")
    val out = Curate.curate(corpus, "doc_id", "text",
      minTokens = 5L, minAlpha = 0.5, nearDup = false,
      maxDupGramFrac = Some(0.5),
      benchmark = Some(bench), benchTextCol = "bench_text", decontamK = 5)
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    // both knobs off → both docs come back
    val loose = Curate.curate(corpus, "doc_id", "text",
      minTokens = 5L, minAlpha = 0.5, nearDup = false)
    assert(loose.count() == 4)
  }

  test("curate: r10 stages — redaction, line dedup, substring gate, split labels") {
    val corpus = Seq(
      // near-identical pair differing ONLY in embedded PII: redaction
      // must make them dedup together (one survivor)
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa mail a@x.com here"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa mail b@y.org here"),
      // boilerplate FOOTER line on several docs: line dedup strips it
      // from non-owners before quality scoring
      (3L, "one two three four five six seven eight nine ten\nSHARED FOOTER LINE HERE NOW"),
      (4L, "ichi ni san shi go roku nana hachi kyu ju\nSHARED FOOTER LINE HERE NOW"),
      // heavily self-repeating doc: substring gate drops it
      (5L, ("spam ham " * 20).trim),
      // clean doc
      (6L, "clean doc with plenty of distinct words to pass every quality gate easily today")
    ).toDF("doc_id", "text")
    val out = Curate.curate(corpus, "doc_id", "text",
      minTokens = 5L, minAlpha = 0.5, nearDup = false,
      redactPii = true, lineDedupMaxOcc = Some(1L),
      maxSubstrDupFrac = Some(0.5), substrK = 4,
      split = Some((Seq("train" -> 0.9, "valid" -> 0.1), "seed"))).cache()
    try {
      val ids = out.select("doc_id").as[Long].collect().toSet
      assert(!(ids.contains(1L) && ids.contains(2L)),
        s"redacted twins both survived: $ids") // one of 1/2 deduped away
      assert(ids.contains(1L) || ids.contains(2L))
      assert(ids.contains(3L) && ids.contains(4L) && ids.contains(6L))
      assert(!ids.contains(5L), s"self-repeating doc survived the substring gate: $ids")
      // PII never ships
      assert(out.filter(col("text").contains("@x.com") || col("text").contains("@y.org"))
        .count() == 0L)
      assert(out.filter(col("text").contains("<EMAIL>")).count() <= 1)
      // the footer line survives only in its min-id owner (doc 3)
      val t4 = out.filter(col("doc_id") === 4L).select("text").as[String].head()
      assert(!t4.contains("SHARED FOOTER"), s"non-owner kept the boilerplate line: $t4")
      val t3 = out.filter(col("doc_id") === 3L).select("text").as[String].head()
      assert(t3.contains("SHARED FOOTER"))
      // split labels present and from the declared set
      assert(out.select("split").distinct().as[String].collect().toSet.subsetOf(
        Set("train", "valid")))
    } finally out.unpersist()
  }

  test("curate: removeDupSpansK rewrites docs, excising non-first duplicate spans") {
    val corpus = Seq(
      // doc 1 owns the shared span (global first occurrence)
      (1L, "shared boiler plate span here plus unique alpha beta gamma delta epsilon"),
      // doc 2 repeats it: the span is excised, the unique tail survives
      (2L, "shared boiler plate span here plus unique zeta eta theta iota kappa"),
      // clean doc: untouched
      (3L, "totally different content with many distinct words passing the gates fine")
    ).toDF("doc_id", "text")
    val out = Curate.curate(corpus, "doc_id", "text",
      minTokens = 3L, minAlpha = 0.5, nearDup = false,
      removeDupSpansK = Some(4)).cache()
    try {
      val byId = out.select(col("doc_id"), col("text")).as[(Long, String)]
        .collect().toMap
      assert(byId.keySet == Set(1L, 2L, 3L))
      assert(byId(1L).startsWith("shared boiler plate span here"),
        s"first occurrence must survive: ${byId(1L)}")
      assert(!byId(2L).contains("shared boiler plate"),
        s"non-first span must be excised: ${byId(2L)}")
      assert(byId(2L).contains("zeta eta theta iota kappa"))
      assert(byId(3L) == "totally different content with many distinct words passing the gates fine")
      // token accounting reflects the REWRITTEN text
      val n2 = out.filter(col("doc_id") === 2L).select("n_tokens").as[Long].head()
      assert(n2 == byId(2L).split("\\s+").length.toLong)
    } finally out.unpersist()
  }

  test("curate: decontamExcise rewrites contaminated docs instead of dropping them") {
    val bench = Seq("what is the capital of france").toDF("text")
    val corpus = Seq(
      (1L, "quiz dump begins what is the capital of france answer key follows here"),
      (2L, "an entirely unrelated clean document with enough distinct words to pass")
    ).toDF("doc_id", "text")
    val out = Curate.curate(corpus, "doc_id", "text",
      minTokens = 3L, minAlpha = 0.5, nearDup = false,
      benchmark = Some(bench), decontamK = 4, decontamExcise = true).cache()
    try {
      val byId = out.select(col("doc_id"), col("text")).as[(Long, String)]
        .collect().toMap
      // excision keeps the doc (the drop form would remove id 1 entirely)
      assert(byId.keySet == Set(1L, 2L))
      assert(!byId(1L).contains("capital of france"), s"eval span shipped: ${byId(1L)}")
      assert(byId(1L).contains("quiz dump begins") && byId(1L).contains("here"))
      assert(byId(2L).contains("unrelated clean document"))
      val n1 = out.filter(col("doc_id") === 1L).select("n_tokens").as[Long].head()
      assert(n1 == byId(1L).split("\\s+").length.toLong)
    } finally out.unpersist()
  }

  test("curate: unicode normalization makes precomposed/decomposed twins dedup together") {
    // same sentence, one rendition precomposed (é), one decomposed
    // (e + combining acute): byte-level exact dedup sees two distinct
    // docs unless the normalize stage canonicalizes first
    val pre = "caf\u00e9 haute cuisine menu avec des plats vari\u00e9s et du bon vin rouge"
    val dec = "cafe\u0301 haute cuisine menu avec des plats varie\u0301s et du bon vin rouge"
    val corpus = Seq((1L, pre), (2L, dec),
      (3L, "a completely different clean document with many distinct words here today"))
      .toDF("doc_id", "text")
    val without = Curate.curate(corpus, "doc_id", "text",
      minTokens = 5L, minAlpha = 0.3, nearDup = false)
    assert(without.count() == 3L, "without normalization the twins are distinct bytes")
    val out = Curate.curate(corpus, "doc_id", "text",
      minTokens = 5L, minAlpha = 0.3, nearDup = false, normalizeUnicode = true)
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L), s"normalized twins must dedup to the min id: $ids")
    // shipped text is the canonical (precomposed) form
    val shipped = out.filter(col("doc_id") === 1L).select("text").as[String].head()
    assert(shipped == pre)
  }

  test("curate: extractHtml strips chrome so gates and dedup see prose") {
    def page(body: String) =
      s"""<html><body><nav><a href="/">Home</a> <a href="/a">About</a> <a href="/b">More</a></nav>
         |<p>$body</p><footer>(c) footer</footer></body></html>""".stripMargin.replace("\n", "")
    val prose = "an honest paragraph with plenty of genuine words to pass the quality gates &amp; more"
    val corpus = Seq(
      (1L, page(prose)),
      (2L, page(prose)), // same prose, same chrome: exact-dedups after extraction
      (3L, page("different but equally substantial prose content with many distinct words here"))
    ).toDF("doc_id", "text")
    val out = Curate.curate(corpus, "doc_id", "text",
      minTokens = 5L, minAlpha = 0.5, nearDup = false, extractHtml = true).cache()
    try {
      val byId = out.select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
      assert(byId.keySet == Set(1L, 3L)) // 2 deduped against 1 post-extraction
      assert(!byId(1L).contains("<") && !byId(1L).contains("Home"))
      assert(byId(1L).contains("genuine words") && byId(1L).contains("&"),
        s"entities must decode: ${byId(1L)}")
    } finally out.unpersist()
  }

  test("curate: foldHomoglyphs makes a Cyrillic-evasive copy dedup with its original") {
    val original = "the quick brown fox jumps over the lazy dog again today"
    val evasive = original.replace("a", "а").replace("o", "о") // Cyrillic а, о
    val corpus = Seq((1L, original), (2L, evasive)).toDF("doc_id", "text")
    val without = Curate.curate(corpus, "doc_id", "text",
      minTokens = 3L, minAlpha = 0.4, nearDup = false)
    assert(without.count() == 2L) // distinct content without the fold
    val withFold = Curate.curate(corpus, "doc_id", "text",
      minTokens = 3L, minAlpha = 0.4, nearDup = false, foldHomoglyphs = true)
    val rows = withFold.select(col("doc_id"), col("text")).as[(Long, String)].collect()
    assert(rows.map(_._1).toSet == Set(1L)) // evasive copy deduped away
    assert(rows.head._2 == original)
  }

  test("curate: gopher rule battery and corpus-LM tail trim stages") {
    val typical = "the quick brown fox jumps over the lazy dog and that cat with style"
    val corpus = (
      // 20 corpus-typical docs padded past the 50-word Gopher floor
      (1L to 20L).map(i => (i, (typical + " ") * 4 + s"doc number $i")) :+
      // mostly-gibberish vocabulary (keeps 2 stopwords for the rule
      // battery): the LM tail — words the corpus never repeats
      (50L, typical + " " + (1 to 45).map(j => s"zzqx${j}vw").mkString(" ")) :+
      // stopword-free doc: fails the Gopher battery, passes the basic gate
      (60L, Seq.fill(60)("word").mkString(" "))
    ).toDF("doc_id", "text")
    // threshold from the data: midpoint between the worst typical
    // score and the gibberish score (robust to vocabulary shifts)
    val scores = graft.functions.LmScore.unigram(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val worstTypical = (1L to 20L).map(scores).max
    assert(scores(50L) > worstTypical, "the gibberish doc must score worst")
    val threshold = (worstTypical + scores(50L)) / 2
    val out = Curate.curate(corpus, "doc_id", "text",
      minTokens = 5L, minAlpha = 0.5, nearDup = false,
      gopherRules = true, maxAvgNll = Some(threshold))
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert((1L to 20L).toSet.subsetOf(ids), s"typical docs must survive: $ids")
    assert(!ids.contains(60L), "the stopword-free doc must fail the rule battery")
    assert(!ids.contains(50L), "the gibberish doc must fail the LM tail trim")
  }

  test("curated corpus ships as TFRecord shards and reads back intact") {
    val curated = Curate.curate(docs, "doc_id", "text", nearDup = true)
    val path = "/tmp/graft_test/pipeline_tfrecord"
    val n = curated.count()
    assert(n >= 4, s"corpus too small to exercise sharding: $n") // empty partitions write no shard
    val shards = graft.sources.TfRecord.write(
      curated.select(encode(col("text"), "UTF-8").as("value")).repartition(4), path)
    assert(shards == 4)
    val back = graft.sources.TfRecord.read(spark, path)
    assert(back.count() == n)
    // content round-trips exactly (sorted md5 sets match)
    val a = curated.select(md5(col("text"))).as[String].collect().sorted.toSeq
    val b = back.select(md5(decode(col("value"), "UTF-8"))).as[String].collect().sorted.toSeq
    assert(a == b)
  }
}
