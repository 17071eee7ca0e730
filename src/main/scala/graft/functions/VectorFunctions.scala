package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, composed from
  * builtin higher-order functions (zip_with/aggregate). HOFs are
  * INTERPRETED, not codegen'd (SURVEY §4's r2 lesson) — these verbs
  * are fine because each is a single pass inside one projection with
  * no UDF boundary or serialization, but a hot multi-pass kernel
  * belongs in a native codegen Expression
  * (expressions/VectorExpressions.scala), not stacked HOFs.
  */
object VectorFunctions {

  /** Dot product, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either side is a zero vector. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(d / (na * nb))
  }

  /** Unit-normalize (array<double>); zero vectors pass through. */
  def normalize(a: Column): Column = {
    val n = l2Norm(a)
    when(n === 0.0, transform(a, x => x.cast("double")))
      .otherwise(transform(a, x => x.cast("double") / n))
  }

  /** Johnson–Lindenstrauss random projection to `outDim` dims: the
    * cheap dimensionality reduction run before ANN / clustering at
    * corpus scale. The ±1 sign matrix is derived from md5 coordinates
    * (s_ij = +1 iff md5head("rp:<seed>:<i>:<j>") is even — the same
    * engine-portable coin every sampler here flips) and scaled by
    * 1/√outDim, built ONCE driver-side (outDim × dim floats, trivially
    * small); each output coordinate is then one native codegen dot
    * product, so the whole projection fuses into the scan — no UDF,
    * no shuffle, no per-row matrix rebuild. Deterministic across
    * engines and reruns by construction.
    */
  def randomProject(vec: Column, dim: Int, outDim: Int, seed: String): Column = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    require(outDim >= 1, s"outDim must be >= 1, got $outDim")
    val scale = (1.0 / math.sqrt(outDim.toDouble)).toFloat
    val rows: Seq[Column] = (0 until outDim).map { j =>
      lit((0 until dim).map { i =>
        val h = graft.expressions.Md5Head.compute(
          org.apache.spark.unsafe.types.UTF8String.fromString(s"rp:$seed:$i:$j"), 8)
        if (h % 2 == 0) scale else -scale
      }.toArray)
    }
    array(rows.map(r => graft.expressions.VectorExpressions.dotF(vec, r)): _*)
  }

  // ---- Breeze-parity algebra (reference: scio-extra/src/main/scala/
  // com/spotify/scio/extra/Breeze.scala:39 — elementwise +/-/*, scalar
  // scaling, axpy over DenseVector; here over array columns as builtin
  // higher-order functions, so the whole verb stays inside one
  // codegen'd projection). All results are array<double>; inputs may
  // be float or double arrays.

  /** Elementwise sum a + b (Breeze `+`). */
  def vecAdd(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x.cast("double") + y.cast("double"))

  /** Elementwise difference a - b (Breeze `-`). */
  def vecSub(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x.cast("double") - y.cast("double"))

  /** Elementwise (Hadamard) product a ∘ b (Breeze `*:*`). */
  def vecHadamard(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x.cast("double") * y.cast("double"))

  /** Scalar scale s·a (Breeze `*`). */
  def vecScale(a: Column, s: Column): Column =
    transform(a, x => x.cast("double") * s.cast("double"))

  /** alpha·x + y — BLAS/Breeze axpy, one fused zip_with. */
  def axpy(alpha: Column, x: Column, y: Column): Column =
    zip_with(x, y, (xi, yi) => alpha.cast("double") * xi.cast("double") + yi.cast("double"))

  /** Sum of elements (Breeze `sum(v)`), accumulated in double. */
  def vecSum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double"))

  /** Mean of elements; null for empty/null arrays. */
  def vecMean(a: Column): Column =
    when(size(a) > 0, vecSum(a) / size(a))

  /** Seeded hyperplane coefficients — plan-time constants shared by
    * [[hyperplaneSignature]] and the external oracle SQL (which embeds
    * the same literals), deterministic across runs and executors.
    */
  def hyperplanes(dim: Int, nBits: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nBits, dim)(rng.nextGaussian())
  }

  /** Random-hyperplane LSH signature: `nBits` sign bits packed into a
    * long. No stored model — the planes are literals in the plan.
    */
  def hyperplaneSignature(vec: Column, dim: Int, nBits: Int, seed: Long = 42L): Column = {
    require(nBits <= 63, "nBits must fit in a long")
    val planes = hyperplanes(dim, nBits, seed)
    (0 until nBits).map { b =>
      val proj = (0 until dim).map(i => element_at(vec, i + 1).cast("double") * lit(planes(b)(i)))
        .reduce(_ + _)
      when(proj > 0.0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
  }
}
