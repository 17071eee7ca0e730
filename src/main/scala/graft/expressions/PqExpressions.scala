package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", IEEE TPAMI 2011) — the compressed-
  * vector scale path the reference reaches through its ANN side-input
  * indexes (scio-extra annoy/voyager): split a dim-d vector into M
  * subvectors, quantize each against a per-subspace codebook of k ≤
  * 256 codewords, and store only the M code bytes. At 100 TB this is
  * the difference between shuffling 256 B and 8 B per embedding.
  *
  * Search uses the asymmetric-distance trick: a probe precomputes a
  * M×k table of subspace dot products ONCE ([[PqLut]], evaluated on
  * the probe side before the join), and every candidate then costs M
  * table lookups ([[PqAdc]]) instead of a dim-length loop.
  *
  * All four kernels are native fused-loop expressions with codegen,
  * for the same reason as [[CosineSimilarity]]: the composed
  * higher-order-function forms are CodegenFallback and pay per-element
  * closure dispatch in the innermost scan.
  *
  * Codebooks are plan-time constants (`Seq[Seq[Seq[Double]]]`,
  * indexed [subspace][code][dim-within-subspace]), carried into
  * generated code via reference objects like [[NearestCentroid]]'s
  * centroid matrix.
  *
  * Null contract (as the other vector kernels): null array, null
  * element, or dim mismatch → null, never an exception.
  */
private[graft] object PqCodebooks {
  def validate(books: Seq[Seq[Seq[Double]]]): Unit = {
    require(books.nonEmpty, "at least one subspace")
    require(books.map(_.size).distinct.size == 1, "all subspaces must share one codebook size k")
    val k = books.head.size
    require(k >= 1 && k <= 256, s"codes must fit one byte: k in [1, 256], got $k")
    require(books.flatMap(_.map(_.size)).distinct.size == 1,
      "all codewords must share one subspace dim")
  }
}

/** pq_encode(array<float>) → binary: the M nearest-codeword indices
  * (squared-L2 per subspace, first-wins tie-break), one byte each.
  */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
  extends UnaryExpression {

  PqCodebooks.validate(codebooks)
  private val m = codebooks.size
  private val k = codebooks.head.size
  private val subDim = codebooks.head.head.size
  private val dim = m * subDim
  @transient private lazy val booksArr: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_pq_encode"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val out = new Array[Byte](m)
    var mi = 0
    while (mi < m) {
      val base = mi * subDim
      var i = 0
      while (i < subDim) {
        if (v.isNullAt(base + i)) return null
        i += 1
      }
      val book = booksArr(mi)
      var best = Double.MaxValue
      var bestC = 0
      var c = 0
      while (c < k) {
        val cw = book(c)
        var d2 = 0.0
        i = 0
        while (i < subDim) {
          val diff = v.getFloat(base + i).toDouble - cw(i)
          d2 += diff * diff
          i += 1
        }
        if (d2 < best) { best = d2; bestC = c }
        c += 1
      }
      out(mi) = bestC.toByte
      mi += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val books = ctx.addReferenceObj("books", booksArr, "double[][][]")
      val out = ctx.freshName("out")
      val mi = ctx.freshName("mi")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val base = ctx.freshName("base")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val d2 = ctx.freshName("d2")
      val diff = ctx.freshName("diff")
      val nullCheck = if (FloatArrayInputs.elementsNullable(child))
        s"""for (int $i = 0; $i < $subDim; $i++) {
           |  if ($v.isNullAt($base + $i)) { ${ev.isNull} = true; break; }
           |}""".stripMargin
      else ""
      s"""
        |if ($v.numElements() != $dim) {
        |  ${ev.isNull} = true;
        |} else {
        |  byte[] $out = new byte[$m];
        |  for (int $mi = 0; $mi < $m && !${ev.isNull}; $mi++) {
        |    final int $base = $mi * $subDim;
        |    $nullCheck
        |    if (${ev.isNull}) break;
        |    double $best = Double.MAX_VALUE;
        |    int $bestC = 0;
        |    for (int $c = 0; $c < $k; $c++) {
        |      double $d2 = 0.0;
        |      for (int $i = 0; $i < $subDim; $i++) {
        |        final double $diff = ((double) $v.getFloat($base + $i)) - $books[$mi][$c][$i];
        |        $d2 += $diff * $diff;
        |      }
        |      if ($d2 < $best) { $best = $d2; $bestC = $c; }
        |    }
        |    $out[$mi] = (byte) $bestC;
        |  }
        |  if (!${ev.isNull}) { ${ev.value} = $out; }
        |}
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** pq_decode(binary) → array<float>: codeword concatenation — the
  * reconstruction ADC scores against. Null for a wrong-length code
  * or a byte ≥ k (foreign/corrupt codes never crash).
  */
case class PqDecode(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
  extends UnaryExpression {

  PqCodebooks.validate(codebooks)
  private val m = codebooks.size
  private val k = codebooks.head.size
  private val subDim = codebooks.head.head.size
  @transient private lazy val booksArr: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_pq_decode"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[Array[Byte]]
    if (codes.length != m) return null
    val out = new Array[Float](m * subDim)
    var mi = 0
    while (mi < m) {
      val c = codes(mi) & 0xFF
      if (c >= k) return null
      val cw = booksArr(mi)(c)
      var i = 0
      while (i < subDim) {
        out(mi * subDim + i) = cw(i).toFloat
        i += 1
      }
      mi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, codes => {
      val books = ctx.addReferenceObj("books", booksArr, "double[][][]")
      val out = ctx.freshName("out")
      val mi = ctx.freshName("mi")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      s"""
        |if ($codes.length != $m) {
        |  ${ev.isNull} = true;
        |} else {
        |  float[] $out = new float[${m * subDim}];
        |  for (int $mi = 0; $mi < $m && !${ev.isNull}; $mi++) {
        |    final int $c = $codes[$mi] & 0xFF;
        |    if ($c >= $k) { ${ev.isNull} = true; break; }
        |    for (int $i = 0; $i < $subDim; $i++) {
        |      $out[$mi * $subDim + $i] = (float) $books[$mi][$c][$i];
        |    }
        |  }
        |  if (!${ev.isNull}) {
        |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
        |  }
        |}
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** pq_lut(array<float>) → array<double>: the probe-side ADC table,
  * lut[mi·k + c] = Σ_i probe[mi·subDim + i] · codebook[mi][c][i] —
  * M·k·subDim = k·dim work done ONCE per probe (projected before the
  * probe frame is broadcast), amortized over every candidate.
  */
case class PqLut(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
  extends UnaryExpression {

  PqCodebooks.validate(codebooks)
  private val m = codebooks.size
  private val k = codebooks.head.size
  private val subDim = codebooks.head.head.size
  private val dim = m * subDim
  // codewords rounded through float: the LUT scores the float
  // reconstruction [[PqDecode]] emits, so pq_adc(codes, lut) ==
  // dot(probe, pq_decode(codes)) EXACTLY (pinned in SimilaritySpec),
  // not merely to within double/float drift.
  @transient private lazy val booksArr: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.map(_.toFloat.toDouble).toArray).toArray).toArray

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_lut"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val out = new Array[Double](m * k)
    var mi = 0
    while (mi < m) {
      val base = mi * subDim
      var i = 0
      while (i < subDim) {
        if (v.isNullAt(base + i)) return null
        i += 1
      }
      val book = booksArr(mi)
      var c = 0
      while (c < k) {
        val cw = book(c)
        var dot = 0.0
        i = 0
        while (i < subDim) {
          dot += v.getFloat(base + i).toDouble * cw(i)
          i += 1
        }
        out(mi * k + c) = dot
        c += 1
      }
      mi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val books = ctx.addReferenceObj("books", booksArr, "double[][][]")
      val out = ctx.freshName("out")
      val mi = ctx.freshName("mi")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val base = ctx.freshName("base")
      val dot = ctx.freshName("dot")
      val nullCheck = if (FloatArrayInputs.elementsNullable(child))
        s"""for (int $i = 0; $i < $subDim; $i++) {
           |  if ($v.isNullAt($base + $i)) { ${ev.isNull} = true; break; }
           |}""".stripMargin
      else ""
      s"""
        |if ($v.numElements() != $dim) {
        |  ${ev.isNull} = true;
        |} else {
        |  double[] $out = new double[${m * k}];
        |  for (int $mi = 0; $mi < $m && !${ev.isNull}; $mi++) {
        |    final int $base = $mi * $subDim;
        |    $nullCheck
        |    if (${ev.isNull}) break;
        |    for (int $c = 0; $c < $k; $c++) {
        |      double $dot = 0.0;
        |      for (int $i = 0; $i < $subDim; $i++) {
        |        $dot += ((double) $v.getFloat($base + $i)) * $books[$mi][$c][$i];
        |      }
        |      $out[$mi * $k + $c] = $dot;
        |    }
        |  }
        |  if (!${ev.isNull}) {
        |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
        |  }
        |}
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** pq_adc(binary, array<double>) → double: Σ_mi lut[mi·k + codes[mi]]
  * — the per-candidate ADC score, M lookups. Exactly equals
  * dot(probe, pq_decode(codes)) by construction (pinned in
  * SimilaritySpec). Null for length/ code-range mismatches.
  */
case class PqAdc(left: Expression, right: Expression, k: Int)
  extends BinaryExpression {

  require(k >= 1 && k <= 256, s"k in [1, 256], got $k")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, array<double>), got (${l.simpleString}, ${r.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[Array[Byte]]
    val lut = b.asInstanceOf[ArrayData]
    if (lut.numElements() != codes.length * k) return null
    var sum = 0.0
    var mi = 0
    while (mi < codes.length) {
      val c = codes(mi) & 0xFF
      if (c >= k) return null
      if (lut.isNullAt(mi * k + c)) return null
      sum += lut.getDouble(mi * k + c)
      mi += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val sum = ctx.freshName("sum")
      val mi = ctx.freshName("mi")
      val c = ctx.freshName("c")
      val mayHaveNulls = FloatArrayInputs.elementsNullable(right)
      val nullCheck = if (mayHaveNulls)
        s"if ($lut.isNullAt($mi * $k + $c)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
        |if ($lut.numElements() != $codes.length * $k) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $sum = 0.0;
        |  for (int $mi = 0; $mi < $codes.length; $mi++) {
        |    final int $c = $codes[$mi] & 0xFF;
        |    if ($c >= $k) { ${ev.isNull} = true; break; }
        |    $nullCheck
        |    $sum += $lut.getDouble($mi * $k + $c);
        |  }
        |  if (!${ev.isNull}) { ${ev.value} = $sum; }
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqExpressions {
  import ColumnBridge.{column, expression => e}
  def pqEncodeF(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    column(PqEncode(e(vec), codebooks))
  def pqDecodeF(codes: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    column(PqDecode(e(codes), codebooks))
  def pqLutF(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    column(PqLut(e(vec), codebooks))
  def pqAdcF(codes: Column, lut: Column, k: Int): Column =
    column(PqAdc(e(codes), e(lut), k))
}
