package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  private def g(text: String): org.apache.spark.sql.Row =
    Seq(Option(text)).toDF("t")
      .select(QualityRules.gopherStruct(col("t")).as("g"))
      .select(col("g.*")).collect()(0)

  // 66 words, mean length ~4, full alpha, 3 required stopwords
  private val goodText =
    Seq.fill(6)("the quick brown fox jumps over lazy dogs and cats with").mkString(" ")

  test("a clean document passes every rule") {
    val r = g(goodText)
    assert(r.getAs[Long]("n_words") == 66L)
    assert(r.getAs[Double]("mean_word_len") >= 3.0 && r.getAs[Double]("mean_word_len") <= 10.0)
    assert(r.getAs[Long]("stop_hits") >= 2L)
    assert(r.getAs[Boolean]("keep"))
  }

  test("word-count bounds: short docs and null text fail") {
    assert(!g("the and with just a few words here").getAs[Boolean]("keep"))
    val r = g(null)
    assert(r.getAs[Long]("n_words") == 0L)
    assert(!r.getAs[Boolean]("keep"))
  }

  test("symbol ratio: hash/ellipsis-dense text fails; counts match") {
    val r = g(goodText + " ###### ...... " + "…" * 5)
    // 6 '#', 2 "..." runs, 5 '…' over 66 + 3 symbol words
    assert(math.abs(r.getAs[Double]("symbol_ratio") - 13.0 / 69.0) < 1e-12)
    assert(!r.getAs[Boolean]("keep"))
  }

  test("bullet and ellipsis line rules") {
    val bullets = (1 to 19).map(i => s"- item $i").mkString("\n")
    val rb = g(goodText + "\n" + bullets + "\nplain")
    assert(rb.getAs[Double]("bullet_ratio") > 0.9 - 1e-12)
    assert(!rb.getAs[Boolean]("keep"))
    val ell = g(goodText + "\ntrailing thought...\nanother one…\nthird line...")
    // 3 of 4 lines end with an ellipsis
    assert(math.abs(ell.getAs[Double]("ellipsis_ratio") - 0.75) < 1e-12)
    assert(!ell.getAs[Boolean]("keep"))
  }

  test("alpha-word ratio and stopword presence") {
    val numeric = Seq.fill(60)("12345").mkString(" ") + " the and"
    val rn = g(numeric)
    assert(rn.getAs[Double]("alpha_ratio") < 0.8)
    assert(!rn.getAs[Boolean]("keep"))
    val noStops = Seq.fill(60)("word").mkString(" ")
    val rs = g(noStops)
    assert(rs.getAs[Long]("stop_hits") == 0L)
    assert(!rs.getAs[Boolean]("keep"))
  }

  test("mean word length bounds reject gibberish") {
    val longWords = Seq.fill(60)("pneumonoultramicroscopic").mkString(" ")
    assert(!g(longWords).getAs[Boolean]("keep"))
    val shortWords = (Seq.fill(58)("a b") ++ Seq("the", "of")).mkString(" ")
    assert(!g(shortWords).getAs[Boolean]("keep"))
  }
}
