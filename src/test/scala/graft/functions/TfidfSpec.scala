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

  test("topTerms ranks by tfidf then term, k bounds the rows") {
    val top = Tfidf.topTerms(docs, "doc_id", "text", k = 1)
      .select("id", "term").as[(Long, String)].collect().toMap
    assert(top(1L) == "apple") // tf 2 beats banana's tf 1
    assert(top(2L) == "cherry") // idf(1) > idf(2) at equal tf
    assert(top(3L) == "apple")
  }
}
