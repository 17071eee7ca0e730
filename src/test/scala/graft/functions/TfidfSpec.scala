package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TfidfSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "apple")).toDF("doc_id", "text")

  test("termDoc computes hand-checked tf, df and smoothed idf") {
    val out = Tfidf.termDoc(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(5)))).toMap
    def idf(df: Long) = math.log(4.0 / (df + 1.0)) + 1.0 // N=3
    assert(out((1L, "apple")) == ((2L, 2L, 2 * idf(2))))
    assert(out((1L, "banana")) == ((1L, 2L, 1 * idf(2))))
    assert(out((2L, "cherry")) == ((1L, 1L, 1 * idf(1))))
    assert(out((3L, "apple")) == ((1L, 2L, 1 * idf(2))))
    assert(out.size == 5) // (1,apple)(1,banana)(2,banana)(2,cherry)(3,apple)
  }

  test("minDocFreq prunes hapax terms; null/empty texts contribute nothing") {
    val withNull = docs.union(Seq((4L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val pruned = Tfidf.termDoc(withNull, "doc_id", "text", minDocFreq = 2L)
    assert(pruned.select("term").distinct().as[String].collect().toSet ==
      Set("apple", "banana"))
  }

  test("bm25 matches the hand-computed Okapi formula") {
    val two = Seq((1L, "x x y"), (2L, "x z")).toDF("doc_id", "text")
    val out = Tfidf.bm25(two, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // N=2, avgdl=2.5; x: df=2, idf=ln(1 + 0.5/2.5)
    val idfX = math.log(1.0 + (2.0 - 2 + 0.5) / 2.5)
    val d1x = idfX * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 3 / 2.5))
    val (tf1, df1, dl1, s1) = out((1L, "x"))
    assert((tf1, df1, dl1) == ((2L, 2L, 3L)))
    assert(math.abs(s1 - d1x) < 1e-12)
    // y: df=1, idf=ln(1 + 1.5/1.5) = ln 2
    val d1y = math.log(2.0) * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * 3 / 2.5))
    assert(math.abs(out((1L, "y"))._4 - d1y) < 1e-12)
  }

  test("bm25 saturates in tf and penalizes long docs") {
    val corpus = Seq(
      (1L, "q"), (2L, "q q q q q q q q"),
      (3L, "q " + Seq.fill(40)("pad").mkString(" "))).toDF("doc_id", "text")
    val s = Tfidf.bm25(corpus, "doc_id", "text")
      .filter(col("term") === "q")
      .select("id", "bm25").as[(Long, Double)].collect().toMap
    assert(s(2L) > s(1L), "more occurrences score higher")
    assert(s(2L) < 8.0 * s(1L), "sub-linear tf saturation")
    assert(s(3L) < s(1L), "same tf in a longer doc scores lower")
  }

  test("topTerms ranks by tfidf then term, k bounds the rows") {
    val top = Tfidf.topTerms(docs, "doc_id", "text", k = 1)
      .select("id", "term").as[(Long, String)].collect().toMap
    assert(top(1L) == "apple") // tf 2 beats banana's tf 1
    assert(top(2L) == "cherry") // idf(1) > idf(2) at equal tf
    assert(top(3L) == "apple")
  }
}
