package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Md5Head must be bit-identical to the composed
  * conv(substring(md5(s), 1, digits), 16, 10) chain it replaced — the
  * md5 arithmetic is a cross-engine CONTRACT (the DuckDB oracles
  * recompute it in SQL), so the kernel may not change a single value.
  */
class Md5HeadSpec extends SparkSpec {
  import spark.implicits._

  private def composed(c: org.apache.spark.sql.Column, digits: Int) =
    conv(substring(md5(c), 1, digits), 16, 10).cast("long")

  test("bit-identical to the composed conv/substring/md5 chain") {
    val rnd = new scala.util.Random(11)
    val strs = (0 until 500).map { i =>
      i % 5 match {
        case 0 => rnd.nextString(rnd.nextInt(40)) // arbitrary unicode
        case 1 => rnd.alphanumeric.take(rnd.nextInt(30)).mkString
        case 2 => s"seed:$i"
        case 3 => "" // empty
        case _ => "naïve — résumé ✓ " + i
      }
    }
    val df = strs.toDF("s")
    for (digits <- Seq(1, 8, 15)) {
      val bad = df.select(
          Md5Head.md5HeadF(col("s"), digits).as("fused"),
          composed(col("s"), digits).as("ref"))
        .filter(col("fused") =!= col("ref")).count()
      assert(bad == 0, s"digits=$digits")
    }
  }

  test("null propagates; value range matches the digit budget") {
    assert(Seq(Option.empty[String]).toDF("s")
      .select(Md5Head.md5HeadF(col("s"), 8).isNull).as[Boolean].head())
    val vals = (0 until 200).map(i => s"k$i").toDF("s")
      .select(Md5Head.md5HeadF(col("s"), 15)).as[Long].collect()
    assert(vals.forall(v => v >= 0 && v < (1L << 60)))
  }

  test("the consumers stay oracle-arithmetic-equal (split assignment census)") {
    // assignSplit over a key census: the DuckDB-reproducible contract
    // is the composed chain; the operator now uses the kernel — both
    // must agree on every key
    val keys = spark.range(0, 5000).selectExpr("CAST(id AS STRING) AS k")
    val viaKernel = graft.operators.Splits.hashCoordinate(col("k"), "s1")
    val viaChain = composed(concat_ws(":", lit("s1"), col("k")), 8)
    assert(keys.filter(viaKernel =!= viaChain).count() == 0)
  }
}
