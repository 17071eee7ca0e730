package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Native codegen expressions must agree exactly with the composed
  * (zip_with/aggregate) forms they accelerate, in both codegen and
  * interpreted evaluation.
  */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  test("cosineF matches composed cosine on real embeddings") {
    val pairs = vecs.as("a").crossJoin(vecs.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(5000)
    val maxDiff = pairs.select(abs(
        VectorExpressions.cosineF(col("a.embedding"), col("b.embedding")) -
          VectorFunctions.cosine(col("a.embedding"), col("b.embedding"))).as("d"))
      .agg(max("d")).as[Double].head()
    assert(maxDiff < 1e-12)
  }

  test("dotF matches composed dot") {
    val pairs = vecs.as("a").crossJoin(vecs.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(1000)
    val maxDiff = pairs.select(abs(
        VectorExpressions.dotF(col("a.embedding"), col("b.embedding")) -
          VectorFunctions.dot(col("a.embedding"), col("b.embedding"))).as("d"))
      .agg(max("d")).as[Double].head()
    assert(maxDiff < 1e-9)
  }

  test("null input yields null; zero vector yields 0.0") {
    val df = Seq(
      (Some(Seq(1f, 2f)), Some(Seq(1f, 2f))),
      (None, Some(Seq(1f, 2f))),
      (Some(Seq(0f, 0f)), Some(Seq(1f, 2f)))
    ).toDF("a", "b")
    val out = df.select(VectorExpressions.cosineF(col("a"), col("b"))).collect()
    assert(math.abs(out(0).getDouble(0) - 1.0) < 1e-12)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) == 0.0)
  }

  test("null elements and length mismatch yield null (as the composed form does)") {
    val df = Seq(
      (Seq[java.lang.Float](1f, null), Seq[java.lang.Float](1f, 2f)), // null element
      (Seq[java.lang.Float](1f), Seq[java.lang.Float](1f, 2f))        // length mismatch
    ).toDF("a", "b")
    val out = df.select(
      VectorExpressions.cosineF(col("a"), col("b")).as("nc"),
      VectorExpressions.dotF(col("a"), col("b")).as("nd"),
      VectorFunctions.cosine(col("a"), col("b")).as("cc"))
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2), r.toString)
    }
  }

  test("hyperplaneCellF matches the composed hyperplaneSignature bit-for-bit") {
    val planes = VectorFunctions.hyperplanes(dim = 64, nBits = 4, seed = 42L)
      .map(_.toSeq).toSeq
    val diff = vecs.limit(500).select(
        VectorExpressions.hyperplaneCellF(col("embedding"), planes).as("fused"),
        VectorFunctions.hyperplaneSignature(col("embedding"), 64, 4, 42L).as("composed"))
      .filter(col("fused") =!= col("composed")).count()
    assert(diff == 0L)
  }

  test("hyperplaneCellF null contract: null array / null element / wrong dim → null") {
    val planes = Seq(Seq(1.0, -1.0))
    val df = Seq(
      (1L, Option(Seq[java.lang.Float](2f, 1f))),   // proj 1 > 0 → bit set
      (2L, Option(Seq[java.lang.Float](1f, 2f))),   // proj -1 → 0
      (3L, None),                                   // null array
      (4L, Option(Seq[java.lang.Float](1f, null))), // null element
      (5L, Option(Seq[java.lang.Float](1f)))        // wrong dim
    ).toDF("id", "v")
    val out = df.select(col("id"), VectorExpressions.hyperplaneCellF(col("v"), planes).as("c"))
      .orderBy("id").collect()
    assert(out(0).getLong(1) == 1L && out(1).getLong(1) == 0L)
    assert(out(2).isNullAt(1) && out(3).isNullAt(1) && out(4).isNullAt(1))
  }

  test("nearestCentroidF picks the max-cosine centroid; null contract holds") {
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(-1.0, 0.0))
    val df = Seq(
      (1L, Option(Seq[java.lang.Float](3f, 1f))),   // → centroid 0
      (2L, Option(Seq[java.lang.Float](1f, 3f))),   // → centroid 1
      (3L, Option(Seq[java.lang.Float](-2f, 0.1f))),// → centroid 2
      (4L, Option(Seq[java.lang.Float](0f, 0f))),   // zero vec → first (0)
      (5L, None),                                   // null array
      (6L, Option(Seq[java.lang.Float](1f, null))), // null element
      (7L, Option(Seq[java.lang.Float](1f)))        // wrong dim
    ).toDF("id", "v")
    val out = df.select(col("id"),
        VectorExpressions.nearestCentroidF(col("v"), cents).as("c"))
      .orderBy("id").collect()
    assert(out.take(4).map(_.getInt(1)).toSeq == Seq(0, 1, 2, 0))
    assert(out(4).isNullAt(1) && out(5).isNullAt(1) && out(6).isNullAt(1))
    // on real embeddings the fused argmax achieves the best composed cosine
    val cents64 = VectorFunctions.hyperplanes(dim = 64, nBits = 8, seed = 7L)
      .map(_.toSeq).toSeq
    val centsDf = cents64.zipWithIndex
      .map { case (c, i) => (i, c.map(_.toFloat)) }.toDF("cid", "cvec")
    val best = vecs.limit(200).crossJoin(centsDf)
      .groupBy(col("vec_id"))
      .agg(max(VectorExpressions.cosineF(col("embedding"), col("cvec"))).as("best_sim"))
    val chosen = vecs.limit(200).select(col("vec_id"), col("embedding"),
        VectorExpressions.nearestCentroidF(col("embedding"), cents64).as("cid"))
      .join(centsDf, Seq("cid"))
      .select(col("vec_id"),
        VectorExpressions.cosineF(col("embedding"), col("cvec")).as("chosen_sim"))
    val maxGap = best.join(chosen, Seq("vec_id"))
      .select(max(abs(col("best_sim") - col("chosen_sim")))).as[Double].head()
    assert(maxGap < 1e-9, s"fused argmax not optimal: gap $maxGap")
  }

  test("interpreted path (non-codegen) agrees with codegen") {
    // Window partitions evaluate projections; also force interpreted
    // mode via the fallback config on a tiny frame.
    val conf = spark.conf
    val old = conf.get("spark.sql.codegen.wholeStage")
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      val out = Seq((Seq(1f, 0f), Seq(0.5f, 0.5f))).toDF("a", "b")
        .select(VectorExpressions.cosineF(col("a"), col("b"))).as[Double].head()
      assert(math.abs(out - math.sqrt(0.5)) < 1e-12)
    } finally conf.set("spark.sql.codegen.wholeStage", old)
  }

  test("randomProject: JL distance preservation and exact determinism") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 40)
    val proj = emb.select(col("vec_id"),
      graft.functions.VectorFunctions.randomProject(col("embedding"), 64, 32, "t").as("p"),
      col("embedding"))
    val rows = proj.collect().map { r =>
      (r.getLong(0), r.getSeq[Double](1).toArray, r.getSeq[Float](2).map(_.toDouble).toArray)
    }
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // pairwise squared distances preserved within the JL ballpark
    val ratios = for {
      i <- rows.indices; j <- (i + 1) until rows.length
      orig = d2(rows(i)._3, rows(j)._3) if orig > 1e-9
    } yield d2(rows(i)._2, rows(j)._2) / orig
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.3, s"JL mean distance ratio off: $mean")
    assert(ratios.count(r => r > 0.3 && r < 2.0).toDouble / ratios.size > 0.95,
      s"too many badly distorted pairs")
    // deterministic across evaluations and identical to a recompute
    val again = proj.collect().map(r => r.getSeq[Double](1).toArray)
    assert(rows.map(_._2.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("Breeze-parity verbs: exact elementwise algebra on known vectors") {
    val df = Seq((Seq(1f, -2f, 3f), Seq(10f, 20f, 30f))).toDF("x", "y")
    val out = df.select(
      VectorFunctions.vecAdd(col("x"), col("y")).as("add"),
      VectorFunctions.vecSub(col("x"), col("y")).as("sub"),
      VectorFunctions.vecHadamard(col("x"), col("y")).as("had"),
      VectorFunctions.vecScale(col("x"), lit(2.0)).as("scl"),
      VectorFunctions.axpy(lit(2.0), col("x"), col("y")).as("axpy"),
      VectorFunctions.vecSum(col("x")).as("sum"),
      VectorFunctions.vecMean(col("y")).as("mean")).head()
    assert(out.getSeq[Double](0) == Seq(11.0, 18.0, 33.0))
    assert(out.getSeq[Double](1) == Seq(-9.0, -22.0, -27.0))
    assert(out.getSeq[Double](2) == Seq(10.0, -40.0, 90.0))
    assert(out.getSeq[Double](3) == Seq(2.0, -4.0, 6.0))
    assert(out.getSeq[Double](4) == Seq(12.0, 16.0, 36.0))
    assert(out.getDouble(5) == 2.0)
    assert(out.getDouble(6) == 20.0)
  }

  test("Breeze-parity verbs satisfy algebraic identities on real embeddings") {
    // axpy(a, x, y) == vecAdd(vecScale(x, a), y), and
    // sum(add) == sum(x) + sum(y) — on the corpus, not toy vectors
    val pairs = vecs.as("a").join(vecs.as("b"),
      col("a.vec_id") + 1 === col("b.vec_id"))
      .select(col("a.embedding").as("x"), col("b.embedding").as("y"))
    val gaps = pairs.select(
      aggregate(zip_with(
          VectorFunctions.axpy(lit(2.5), col("x"), col("y")),
          VectorFunctions.vecAdd(VectorFunctions.vecScale(col("x"), lit(2.5)), col("y")),
          (p, q) => abs(p - q)),
        lit(0.0), (acc, v) => greatest(acc, v)).as("axpy_gap"),
      abs(VectorFunctions.vecSum(VectorFunctions.vecAdd(col("x"), col("y")))
        - VectorFunctions.vecSum(col("x")) - VectorFunctions.vecSum(col("y"))).as("sum_gap"))
    val worst = gaps.agg(max(col("axpy_gap")), max(col("sum_gap"))).head()
    assert(worst.getDouble(0) < 1e-9 && worst.getDouble(1) < 1e-9)
  }

  test("type check rejects non-float arrays with a clear message") {
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VectorExpressions.cosineF(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("array<float>"))
  }
}
