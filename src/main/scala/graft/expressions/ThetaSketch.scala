package graft.expressions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta-sketch distinct-count set algebra (Apache DataSketches — the
  * library Spark itself bundles for `hll_sketch_agg`).
  *
  * Why theta next to HLL: HLL sketches union losslessly but can only
  * INTERSECT by inclusion-exclusion (|A∩B| = |A|+|B|−|A∪B|), whose
  * error is amplified by the magnitude of the inputs — useless when
  * the overlap is small relative to the sides, which is exactly the
  * interesting case for corpus-overlap questions ("how many documents
  * do these two crawls share?"). Theta sketches carry a sample of the
  * distinct-hash SET, so intersection and difference are first-class
  * with bounded relative error (Dasgupta et al., "Theta-Sketch
  * Framework" 2016).
  *
  * Exactness contract used by the oracle gate: an UpdateSketch stays
  * in EXACT mode until it retains 2^lgK hashes; while exact, estimate
  * == true distinct count and set ops are exact too. Size lgK above
  * the expected distinct cardinality and the whole algebra is exact —
  * the spec pins estimation-mode error bounds separately.
  *
  * Reference intent: scio's ApproxDistinctCounter estimator surface
  * (scio-core estimators/ApproxDistinctCounter.scala) and the
  * scio-extra hll module stop at per-key distinct ESTIMATES; the
  * set-algebra layer is the part a 100 TB curation pipeline needs for
  * crawl-overlap planning (dedup budget, incremental-crawl novelty).
  */
object ThetaOps {
  final val OpUnion = 0
  final val OpIntersect = 1
  final val OpANotB = 2

  /** Canonical empty compact sketch bytes (null input ≡ empty set). */
  lazy val emptyBytes: Array[Byte] =
    org.apache.datasketches.theta.UpdateSketch.builder().build().compact().toByteArray

  def wrap(bytes: Array[Byte]): Sketch =
    if (bytes == null) Sketches.wrapCompactSketch(Memory.wrap(emptyBytes))
    else Sketches.wrapCompactSketch(Memory.wrap(bytes))

  def estimate(bytes: Array[Byte]): Double = wrap(bytes).getEstimate

  /** numStdDev ∈ {1,2,3}; upper=false → lower bound. */
  def bound(bytes: Array[Byte], numStdDev: Int, upper: Boolean): Double = {
    val s = wrap(bytes)
    if (upper) s.getUpperBound(numStdDev) else s.getLowerBound(numStdDev)
  }

  /** Set-combine two compact sketches; null operand ≡ empty set.
    * Output is an ordered compact sketch (deterministic bytes in
    * exact mode — the set of retained hashes is partition-order
    * independent).
    *
    * The union GADGET is sized at theta's maximum (lgK=26) so the
    * combine step never degrades precision below the inputs' own:
    * precision is the build-time lgK's job, and a QuickSelect gadget
    * grows with retained entries, so the big nominal costs nothing
    * until sketches actually carry that many hashes (two compact
    * inputs retain ≤ 2·2^buildLgK ≪ 2^26). Intersection and aNotB
    * never sample — their capacity is bounded by the smaller input.
    */
  def combine(a: Array[Byte], b: Array[Byte], op: Int): Array[Byte] = {
    val sa = wrap(a)
    val sb = wrap(b)
    val out: CompactSketch = op match {
      case OpUnion =>
        val u = SetOperation.builder().setLogNominalEntries(26).buildUnion()
        u.union(sa); u.union(sb); u.getResult
      case OpIntersect =>
        val i = SetOperation.builder().buildIntersection()
        i.intersect(sa); i.intersect(sb); i.getResult
      case OpANotB =>
        SetOperation.builder().buildANotB().aNotB(sa, sb)
      case other => throw new IllegalArgumentException(s"unknown theta op $other")
    }
    out.toByteArray
  }
}

/** theta_sketch_agg(v, lgK) → binary: one compact theta sketch of the
  * distinct values of `v` per group. Accepts long/string/binary input
  * (cast narrower integrals to long); nulls are skipped (a null is not
  * a distinct value, matching count(distinct)). Empty input → the
  * empty sketch (estimate 0), never null — set algebra downstream
  * treats absence and emptiness identically.
  *
  * Buffer is a heap theta Union; partial aggregation (map-side
  * combine) works like any TypedImperativeAggregate — at 100 TB each
  * task ships one ≤ 2^lgK·8-byte sketch, never its rows.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  require(lgK >= 4 && lgK <= 26, s"theta lgK must be in [4,26], got $lgK")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_theta_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires long/string/binary input, got ${other.simpleString} " +
        "(cast narrower integrals to long)")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType => buffer.update(v.asInstanceOf[Long])
      case StringType => buffer.update(v.asInstanceOf[UTF8String].toString)
      case BinaryType => buffer.update(v.asInstanceOf[Array[Byte]])
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

object ThetaSketchAgg {
  import ColumnBridge.{column, expression => e}
  def thetaAggF(v: Column, lgK: Int): Column =
    column(ThetaSketchAgg(e(v), lgK).toAggregateExpression())
}

/** theta_estimate(sketch) → double: distinct-count estimate from a
  * compact theta sketch (exact while the sketch never left exact
  * mode). null → null.
  */
case class ThetaEstimate(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_theta_estimate"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary theta sketch, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    ThetaOps.estimate(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.ThetaOps.estimate($c)")

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

object ThetaEstimate {
  import ColumnBridge.{column, expression => e}
  def thetaEstimateF(sketch: Column): Column = column(ThetaEstimate(e(sketch)))
}

/** theta_combine(a, b, op) → binary: set-combine two compact theta
  * sketches (union / intersect / a-not-b). A NULL side means the
  * empty set — the natural semantics under the full-outer group join
  * this composes with (a group absent from one crawl contributes
  * nothing). Output is never null.
  */
case class ThetaCombine(left: Expression, right: Expression, op: Int)
  extends BinaryExpression {

  require(op >= 0 && op <= 2, s"theta op must be 0=union/1=intersect/2=aNotB, got $op")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = op match {
    case ThetaOps.OpUnion => "graft_theta_union"
    case ThetaOps.OpIntersect => "graft_theta_intersect"
    case _ => "graft_theta_anotb"
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, binary) theta sketches, got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input).asInstanceOf[Array[Byte]]
    val b = right.eval(input).asInstanceOf[Array[Byte]]
    ThetaOps.combine(a, b, op)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGen = left.genCode(ctx)
    val rGen = right.genCode(ctx)
    val lVal = if (left.nullable) s"(${lGen.isNull} ? null : ${lGen.value})" else lGen.value
    val rVal = if (right.nullable) s"(${rGen.isNull} ? null : ${rGen.value})" else rGen.value
    val resultCode =
      code"""
        |${lGen.code}
        |${rGen.code}
        |byte[] ${ev.value} =
        |  graft.expressions.ThetaOps.combine($lVal, $rVal, $op);
      """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ThetaCombine =
    copy(left = newLeft, right = newRight)
}

object ThetaCombine {
  import ColumnBridge.{column, expression => e}
  def thetaUnionF(a: Column, b: Column): Column =
    column(ThetaCombine(e(a), e(b), ThetaOps.OpUnion))
  def thetaIntersectF(a: Column, b: Column): Column =
    column(ThetaCombine(e(a), e(b), ThetaOps.OpIntersect))
  def thetaANotBF(a: Column, b: Column): Column =
    column(ThetaCombine(e(a), e(b), ThetaOps.OpANotB))
}
