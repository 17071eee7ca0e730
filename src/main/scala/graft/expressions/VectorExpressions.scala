package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Shared input validation: both sides must be array<float> (callers
  * cast explicitly — implicit-cast traits are private[sql]). */
private[expressions] object FloatArrayInputs {
  def elementsNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }
}

private[expressions] trait FloatArrayInputs { self: BinaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
}

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * The composed form (zip_with + aggregate in VectorFunctions) is
  * correct but interpreted: higher-order functions are CodegenFallback,
  * so a KNN scan pays per-element closure dispatch for every candidate
  * pair. These expressions generate a single fused Java loop inside
  * whole-stage codegen — the kernel a native engine would emit — which
  * is what the reference's Annoy/Voyager-backed lookups amount to
  * per-pair (reference: scio-extra annoy/voyager packages).
  */

/** cosine(array<float>, array<float>) → double, one fused loop for
  * dot product and both norms; 0.0 when either side is a zero vector.
  * Null-intolerant: null input → null (matches builtin arithmetic).
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression with FloatArrayInputs {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"
  // null even for non-null inputs (length mismatch / null element)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null // matches composed zip_with form
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null // null element → NULL
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      // per-element null checks only when the schema allows nulls
      val mayHaveNulls = FloatArrayInputs.elementsNullable(left) ||
        FloatArrayInputs.elementsNullable(right)
      val nullCheck = if (mayHaveNulls)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
        |final int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    $nullCheck
        |    final double $xi = $a.getFloat($i);
        |    final double $yi = $b.getFloat($i);
        |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        |  }
        |  if (!${ev.isNull}) {
        |    ${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0
        |      : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        |  }
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** dot(array<float>, array<float>) → double, single fused loop. */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with FloatArrayInputs {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val mayHaveNulls = FloatArrayInputs.elementsNullable(left) ||
        FloatArrayInputs.elementsNullable(right)
      val nullCheck = if (mayHaveNulls)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
        |final int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $dot = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    $nullCheck
        |    $dot += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
        |  }
        |  if (!${ev.isNull}) { ${ev.value} = $dot; }
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** hyperplane_cell(array<float>) → long: random-hyperplane LSH cell —
  * bit b is set iff Σ_i vec[i]·planes(b)(i) > 0, accumulating in
  * double, elements in index order — bit-for-bit the arithmetic of
  * the composed element_at form in VectorFunctions.hyperplaneSignature
  * (and of the DuckDB oracle that embeds the same plane literals).
  *
  * Exists because the composed form expands to nBits×dim expression
  * nodes (256 for 4×64): correct, but the generated Java is so large
  * that Janino compilation dominates small jobs and the method blows
  * past the JVM's 8 KB JIT limit on big ones (bytecode-interpreted
  * inner loop). This is one fused loop: tiny codegen, JIT-friendly.
  *
  * Null contract: null array → null; a null element → null (the
  * composed form DIVERGES here: its when(proj > 0, …).otherwise(0)
  * turns the null projection into a 0 bit — nulling the whole cell is
  * the safer read, since a partial vector has no meaningful cell); an
  * array shorter/longer than the planes' dim → null (this is the case
  * where the composed form would raise under ANSI element_at).
  * Bit-for-bit equality with the composed form therefore holds for
  * null-free fixed-dim vectors — which corpus embeddings are, and
  * which is the precondition VectorExpressionsSpec pins.
  */
case class HyperplaneCell(child: Expression, planes: Seq[Seq[Double]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(planes.nonEmpty && planes.size <= 63, "1..63 planes (bits must fit a long)")
  require(planes.map(_.size).distinct.size == 1, "all planes must share one dim")

  private val nBits = planes.size
  private val dim = planes.head.size
  // Array form for the hot loop (also what codegen references).
  @transient private lazy val planesArr: Array[Array[Double]] = planes.map(_.toArray).toArray

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_cell"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    var cell = 0L
    var b = 0
    while (b < nBits) {
      val plane = planesArr(b)
      var proj = 0.0
      var i = 0
      while (i < dim) {
        if (v.isNullAt(i)) return null
        proj += v.getFloat(i).toDouble * plane(i)
        i += 1
      }
      if (proj > 0.0) cell |= 1L << b
      b += 1
    }
    cell
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planesRef = ctx.addReferenceObj("planes", planesArr, "double[][]")
      val cell = ctx.freshName("cell")
      val proj = ctx.freshName("proj")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val mayHaveNulls = FloatArrayInputs.elementsNullable(child)
      val nullCheck = if (mayHaveNulls)
        s"if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
        |if ($v.numElements() != $dim) {
        |  ${ev.isNull} = true;
        |} else {
        |  long $cell = 0L;
        |  for (int $b = 0; $b < $nBits && !${ev.isNull}; $b++) {
        |    double $proj = 0.0;
        |    for (int $i = 0; $i < $dim; $i++) {
        |      $nullCheck
        |      $proj += ((double) $v.getFloat($i)) * $planesRef[$b][$i];
        |    }
        |    if ($proj > 0.0) $cell |= 1L << $b;
        |  }
        |  if (!${ev.isNull}) { ${ev.value} = $cell; }
        |}
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** nearest_centroid(array<float>) → int: index of the max-cosine
  * centroid — the IVF coarse-quantizer assignment, fused into one
  * k×dim loop (same giant-expression rationale as [[HyperplaneCell]]:
  * the composed crossJoin+window argmax is correct but shuffles the
  * corpus; this is a pure projection).
  *
  * Argmax arithmetic: for a fixed input v, argmax_c cos(v, c) =
  * argmax_c dot(v, c)/|c| (|v| > 0 scales all candidates equally), so
  * centroid inverse norms are precomputed once. Zero centroids score
  * 0; a zero input vector scores 0 everywhere and lands in centroid 0
  * (deterministic first-wins tie-break, lowest index).
  *
  * Null contract (as HyperplaneCell): null array / null element /
  * dim mismatch → null.
  */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(centroids.nonEmpty, "at least one centroid")
  require(centroids.map(_.size).distinct.size == 1, "all centroids must share one dim")

  private val k = centroids.size
  private val dim = centroids.head.size
  @transient private lazy val centsArr: Array[Array[Double]] = centroids.map(_.toArray).toArray
  @transient private lazy val invNorms: Array[Double] = centsArr.map { c =>
    val n = math.sqrt(c.map(x => x * x).sum)
    if (n == 0.0) 0.0 else 1.0 / n
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_centroid"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    var best = Double.NegativeInfinity
    var bestIdx = 0
    var c = 0
    while (c < k) {
      val cent = centsArr(c)
      var dot = 0.0
      var i = 0
      while (i < dim) {
        if (v.isNullAt(i)) return null
        dot += v.getFloat(i).toDouble * cent(i)
        i += 1
      }
      val sim = dot * invNorms(c)
      if (sim > best) { best = sim; bestIdx = c }
      c += 1
    }
    bestIdx
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val centsRef = ctx.addReferenceObj("cents", centsArr, "double[][]")
      val invRef = ctx.addReferenceObj("invNorms", invNorms, "double[]")
      val best = ctx.freshName("best")
      val bestIdx = ctx.freshName("bestIdx")
      val dot = ctx.freshName("dot")
      val sim = ctx.freshName("sim")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val mayHaveNulls = FloatArrayInputs.elementsNullable(child)
      val nullCheck = if (mayHaveNulls)
        s"if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
        |if ($v.numElements() != $dim) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $best = Double.NEGATIVE_INFINITY;
        |  int $bestIdx = 0;
        |  for (int $c = 0; $c < $k && !${ev.isNull}; $c++) {
        |    double $dot = 0.0;
        |    for (int $i = 0; $i < $dim; $i++) {
        |      $nullCheck
        |      $dot += ((double) $v.getFloat($i)) * $centsRef[$c][$i];
        |    }
        |    final double $sim = $dot * $invRef[$c];
        |    if ($sim > $best) { $best = $sim; $bestIdx = $c; }
        |  }
        |  if (!${ev.isNull}) { ${ev.value} = $bestIdx; }
        |}
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  import ColumnBridge.{column, expression => e}
  /** Column-level entry points (classic-API Expression→Column). */
  def cosineF(a: Column, b: Column): Column = column(CosineSimilarity(e(a), e(b)))
  def dotF(a: Column, b: Column): Column = column(DotProduct(e(a), e(b)))
  def hyperplaneCellF(vec: Column, planes: Seq[Seq[Double]]): Column =
    column(HyperplaneCell(e(vec), planes))
  def nearestCentroidF(vec: Column, centroids: Seq[Seq[Double]]): Column =
    column(NearestCentroid(e(vec), centroids))
}
