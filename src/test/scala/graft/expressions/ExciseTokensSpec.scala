package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The fused excision kernel vs a plain Scala reference: sorted
  * positions, merged [p, p+k) spans, complement copied in order.
  */
class ExciseTokensSpec extends SparkSpec {
  import spark.implicits._

  private def reference(toks: Seq[String], ps: Seq[Long], k: Int): Seq[String] = {
    val removed = Array.fill(toks.length)(false)
    ps.foreach(p => (p until math.min(p + k, toks.length.toLong))
      .foreach(i => removed(i.toInt) = true))
    toks.zipWithIndex.collect { case (t, i) if !removed(i) => t }
  }

  test("kernel equals the reference on randomized inputs (overlaps, duplicates, clamps)") {
    val rnd = new scala.util.Random(13)
    val cases = (0 until 300).map { _ =>
      val n = rnd.nextInt(40)
      val toks = Seq.fill(n)(s"w${rnd.nextInt(9)}")
      val m = rnd.nextInt(12)
      // positions may repeat and may overlap heavily
      val ps = Seq.fill(m)(rnd.nextInt(math.max(n, 1)).toLong)
      (toks, ps)
    }
    for (k <- Seq(1, 3, 7)) {
      val df = cases.toDF("toks", "ps")
      val out = df.select(
        ExciseTokens.exciseF(col("toks"), col("ps"), k).as("kept"),
        col("toks"), col("ps")).collect()
      out.foreach { r =>
        val kept = r.getSeq[String](0)
        val toks = r.getSeq[String](1)
        val ps = r.getSeq[Long](2)
        assert(kept == reference(toks, ps, k), s"k=$k toks=$toks ps=$ps")
      }
    }
  }

  test("empty positions return the input unchanged; empty tokens stay empty") {
    val df = Seq(
      (Seq("a", "b", "c"), Seq.empty[Long]),
      (Seq.empty[String], Seq(0L, 1L))
    ).toDF("toks", "ps")
    val out = df.select(ExciseTokens.exciseF(col("toks"), col("ps"), 2))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("a", "b", "c"))
    assert(out(1) == Seq.empty[String])
  }

  test("interpreted path (non-codegen) agrees with codegen") {
    val df = Seq((Seq("a", "b", "c", "d", "e", "f"), Seq(1L, 3L))).toDF("toks", "ps")
    val expected = Seq("a", "f") // [1,3) ∪ [3,5) = [1,5) at k=2? no: [1,3)+[3,5) merge → remove 1..4
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val out = df.select(ExciseTokens.exciseF(col("toks"), col("ps"), 2))
        .as[Seq[String]].collect()
      assert(out.head == expected)
    }
    val out2 = df.select(ExciseTokens.exciseF(col("toks"), col("ps"), 2))
      .as[Seq[String]].collect()
    assert(out2.head == expected)
  }

  private def withSQLConf[T](pairs: (String, String)*)(body: => T): T = {
    val conf = spark.conf
    val olds = pairs.map { case (key, _) => key -> conf.getOption(key) }
    try { pairs.foreach { case (key, v) => conf.set(key, v) }; body }
    finally olds.foreach {
      case (key, Some(v)) => conf.set(key, v)
      case (key, None) => conf.unset(key)
    }
  }
}
