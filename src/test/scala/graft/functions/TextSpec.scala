package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("langId identifies clearly-marked languages") {
    val samples = Seq(
      ("en", "the cat sat on the mat and it was happy with the dog in the house"),
      ("es", "la casa de la abuela es grande y los gatos juegan en el jardin con una pelota"),
      ("de", "der hund und die katze sind in dem haus mit einem ball und das ist gut"),
      ("fr", "le chien et les chats sont dans la maison avec une balle et il est content du jour"),
      ("zh", "这是一个中文句子的例子"),
      ("und", "xyzzy plugh qwerty asdf zxcv")
    ).toDF("expected", "text")
    val out = samples.withColumn("pred", TextFunctions.langId(col("text")))
      .collect().map(r => r.getString(0) -> r.getAs[String]("pred"))
    out.foreach { case (exp, pred) => assert(pred == exp, s"expected $exp got $pred") }
  }

  test("tokenCounts: whitespace + BPE-ish estimate") {
    val out = Seq("hello world foo").toDF("text")
      .select(TextFunctions.tokenCounts(col("text")).as("tc"))
      .select(col("tc.n_ws_tokens"), col("tc.n_bpe_est")).collect().head
    assert(out.getLong(0) == 3L)
    // ceil(5/4) + ceil(5/4) + ceil(3/4) = 2 + 2 + 1
    assert(out.getLong(1) == 5L)
  }

  test("fingerprint is order-sensitive; MinHash shingle sets are not") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "delta gamma beta alpha")
    ).toDF("id", "text")
    val fps = df.select(col("id"),
        TextFunctions.fingerprint(TextFunctions.tokens(col("text"))).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("qualityStruct components stay in range and reward real text") {
    val out = spark.read.parquet(s"$sf/documents.parquet")
      .select(TextFunctions.qualityStruct(col("text")).as("q"))
      .select(col("q.distinct_ratio"), col("q.alpha_ratio"), col("q.quality"))
      .agg(min("distinct_ratio"), max("distinct_ratio"), min("alpha_ratio"),
        max("alpha_ratio"), min("quality"), max("quality"))
      .collect().head
    (0 until 6).foreach { i =>
      assert(out.getDouble(i) >= 0.0 && out.getDouble(i) <= 1.0)
    }
  }

  test("jaccard handles empty and identical sets") {
    val df = Seq((Seq(1L, 2L), Seq(1L, 2L)), (Seq[Long](), Seq[Long]()), (Seq(1L), Seq(2L)))
      .toDF("a", "b")
    val out = df.select(TextFunctions.jaccard(col("a"), col("b"))).as[Double].collect()
    assert(out.toSeq == Seq(1.0, 0.0, 0.0))
  }

  test("repetition: dup/top gram fractions separate repeated from varied text") {
    val docs = Seq(
      (1L, "spam spam spam spam spam"),          // 4 identical 2-grams
      (2L, "one two three four five"),           // 4 distinct 2-grams
      (3L, "a b a b c d"),                       // "a b" twice of 5
      (4L, "solo")                                // shorter than n: one gram
    ).toDF("doc_id", "text")
    val m = TextMetrics.repetition(docs, "doc_id", "text", n = 2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("distinct_grams"),
          r.getAs[Double]("dup_gram_frac"), r.getAs[Double]("top_gram_frac"))).toMap
    assert(m(1L) == ((4L, 1L, 1.0, 1.0)))
    assert(m(2L) == ((4L, 4L, 0.0, 0.25)))
    assert(m(3L) == ((5L, 4L, 0.4, 0.4)))
    assert(m(4L) == ((1L, 1L, 0.0, 1.0)))
  }

  test("collocations: hand-computed windowed pair counts and PMI") {
    // one doc "a b a b", window 2: pairs (gap<=2, ordered):
    // (a,b)@0-1, (a,a)@0-2, (b,a)@1-2, (b,b)@1-3, (a,b)@2-3 →
    // counts: (a,b)=2, (a,a)=1, (b,a)=1, (b,b)=1; total=5
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val m = TextMetrics.collocations(docs, "doc_id", "text", window = 2, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(m.keySet == Set(("a", "b"), ("a", "a"), ("b", "a"), ("b", "b")))
    assert(m(("a", "b"))._1 == 2L)
    // marginals over pair slots: c1(a)=3, c2(b)=3 → pmi(a,b)=ln(2*5/9)
    assert(math.abs(m(("a", "b"))._2 - math.log(10.0 / 9.0)) < 1e-12)
    // c1(b)=2, c2(a)=2 → pmi(b,a)=ln(1*5/4)
    assert(math.abs(m(("b", "a"))._2 - math.log(5.0 / 4.0)) < 1e-12)
    // minCount prunes pairs but keeps marginals intact
    val pruned = TextMetrics.collocations(docs, "doc_id", "text", window = 2,
      minCount = 2L).collect()
    assert(pruned.map(r => (r.getString(0), r.getString(1))).toSet == Set(("a", "b")))
    assert(math.abs(pruned.head.getDouble(3) - math.log(10.0 / 9.0)) < 1e-12)
  }

  test("chunkChars: overlapping windows cover the text; short/empty texts yield one chunk") {
    val df = Seq(
      (1L, "abcdefghij"),   // 10 chars, size 4 overlap 1 → starts 1,4,7,10
      (2L, "ab"),           // shorter than one chunk
      (3L, "")              // empty → one empty chunk
    ).toDF("id", "text")
    val out = df.select(col("id"), TextFunctions.chunkChars(col("text"), 4, 1).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("abcd", "defg", "ghij", "j"))
    assert(out(2L) == Seq("ab"))
    assert(out(3L) == Seq(""))
    // consecutive chunks share exactly `overlap` characters
    out(1L).sliding(2).foreach { case Seq(a, b) => assert(a.takeRight(1) == b.take(1)); case _ => }
  }

  test("chunkWords: token windows share `overlap` tokens and rejoin with single spaces") {
    val df = Seq((1L, "w1  w2 w3\tw4 w5 w6 w7"), (2L, "only two"), (3L, "")).toDF("id", "text")
    val out = df.select(col("id"), TextFunctions.chunkWords(col("text"), 3, 1).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("w1 w2 w3", "w3 w4 w5", "w5 w6 w7", "w7"))
    assert(out(2L) == Seq("only two"))
    assert(out(3L) == Seq(""))
  }

  test("sentences: terminator-attached segments, trimmed, empties dropped") {
    import spark.implicits._
    def seg(s: String): Seq[String] =
      Seq(s).toDF("t").select(TextFunctions.sentences(org.apache.spark.sql.functions.col("t")))
        .as[Seq[String]].head()
    assert(seg("One two. Three!  Four? five") == Seq("One two.", "Three!", "Four?", "five"))
    assert(seg("No terminator at all") == Seq("No terminator at all"))
    assert(seg("Ellipsis... then more.") == Seq("Ellipsis...", "then more."))
    assert(seg("") == Seq.empty)
    // pure-terminator text has no sentence content (the pattern needs
    // at least one non-terminator char) — identical in the RE2 oracle
    assert(seg("...") == Seq.empty)
  }

  test("chunk functions validate size/overlap arguments") {
    intercept[IllegalArgumentException](TextFunctions.chunkChars(col("t"), 0, 0))
    intercept[IllegalArgumentException](TextFunctions.chunkChars(col("t"), 4, 4))
    intercept[IllegalArgumentException](TextFunctions.chunkWords(col("t"), 4, -1))
  }

  test("readability: counts and both Flesch formulas on hand-checked text") {
    import spark.implicits._
    def r(s: String) = Seq(s).toDF("t")
      .select(TextFunctions.readability(col("t")).as("r"))
      .selectExpr("r.n_words", "r.n_sentences", "r.n_syllables", "r.flesch", "r.fk_grade")
      .collect()(0)
    // "the cat sat. it ran!" → 5 words, 2 sentences; vowel groups:
    // e, a, a, i, a = 5 syllables
    val row = r("the cat sat. it ran!")
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == (5L, 2L, 5L))
    val flesch = 206.835 - 1.015 * 5 / 2 - 84.6 * 5 / 5.0
    assert(math.abs(row.getDouble(3) - flesch) < 1e-9)
    val grade = 0.39 * 5 / 2 + 11.8 * 5 / 5.0 - 15.59
    assert(math.abs(row.getDouble(4) - grade) < 1e-9)
    // no terminator → 1 sentence floor; 0-vowel words floor at 1 syllable each
    val row2 = r("xyz pqrst")
    assert((row2.getLong(0), row2.getLong(1), row2.getLong(2)) == (2L, 1L, 2L))
    // empty / null-ish text: zero words, null scores
    val row3 = r("")
    assert(row3.getLong(0) == 0L && row3.isNullAt(3) && row3.isNullAt(4))
  }
}
