package graft.expressions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** KLL quantile sketch (Karnin, Lang, Liberty, FOCS 2016 — the
  * DataSketches implementation Spark already ships) as a MERGEABLE
  * aggregate + artifact kernels.
  *
  * Where it sits among graft's percentile tools:
  *  - `approxQuantile`/`percentile_approx` — one-shot estimates inside
  *    a query; nothing persists;
  *  - `Stats.saveQuantileGrid` — EXACT interpolated boundaries as an
  *    artifact, but refreshing it re-scans the whole corpus;
  *  - KLL — per-group sketches that MERGE: each crawl sketches only
  *    itself, `extendIndex` folds it into the stored distribution
  *    (provable rank-error bound ~1.7%/k=200 scale-independent), and
  *    quantile/rank queries read the merged artifact. The
  *    incremental-percentile shape at 100 TB.
  *
  * Exactness contract (same pattern as theta/freq): a KLL sketch that
  * never compacted (n below its retention capacity, ~3·k at the sizes
  * used here) holds every value, and INCLUSIVE quantiles are then the
  * true order statistics — what makes q_kll_quantiles oracle-checkable
  * against DuckDB's `quantile_disc`.
  */
object KllOps {
  def wrap(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  /** INCLUSIVE quantiles (smallest value whose inclusive rank ≥ p —
    * `quantile_disc` semantics); empty sketch → null.
    */
  def quantiles(bytes: Array[Byte], probs: Array[Double]): GenericArrayData = {
    val s = wrap(bytes)
    if (s.isEmpty) null
    else new GenericArrayData(
      s.getQuantiles(probs, QuantileSearchCriteria.INCLUSIVE).map(Double.box: Double => AnyRef))
  }

  /** Inclusive normalized rank of `value`; empty sketch → null. */
  def rank(bytes: Array[Byte], value: Double): java.lang.Double = {
    val s = wrap(bytes)
    if (s.isEmpty) null else Double.box(s.getRank(value, QuantileSearchCriteria.INCLUSIVE))
  }

  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val sa = wrap(a)
    sa.merge(wrap(b))
    sa.toByteArray
  }

  /** The sketch's a-priori normalized rank error (one-sided, 99% conf). */
  def rankError(bytes: Array[Byte]): Double =
    wrap(bytes).getNormalizedRankError(false)

  def retainedExact(bytes: Array[Byte]): Boolean = {
    val s = wrap(bytes)
    s.getN == s.getNumRetained
  }
}

/** kll_sketch_agg(v, k) → binary: a KLL doubles sketch of `v` per
  * group. Input double/long (cast others); nulls and NaNs are skipped
  * (a NaN has no rank); empty input → empty sketch, never null.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"kll k must be in [8, 65535], got $k")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires double/long input, got ${other.simpleString} " +
        "(cast other numerics explicitly)")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      val d = child.dataType match {
        case DoubleType => v.asInstanceOf[Double]
        case LongType => v.asInstanceOf[Long].toDouble
      }
      if (!d.isNaN) buffer.update(d)
    }
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = KllOps.wrap(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

object KllSketchAgg {
  import ColumnBridge.{column, expression => e}
  def kllAggF(v: Column, k: Int): Column =
    column(KllSketchAgg(e(v), k).toAggregateExpression())
}

/** kll_quantiles(sketch, probs) → array<double>: INCLUSIVE quantiles
  * at the given probabilities. Empty sketch → null.
  */
case class KllQuantiles(child: Expression, probs: Seq[Double]) extends UnaryExpression {

  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    s"quantile probs must be in [0,1], got $probs")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true // empty sketch has no quantiles
  override def prettyName: String = "graft_kll_quantiles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary kll sketch, got ${other.simpleString}")
  }

  private lazy val probsArr = probs.toArray

  override def nullSafeEval(v: Any): Any =
    KllOps.quantiles(v.asInstanceOf[Array[Byte]], probsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val probsRef = ctx.addReferenceObj("kllProbs", probsArr, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expressions.KllOps.quantiles($c, $probsRef);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): KllQuantiles =
    copy(child = newChild)
}

object KllQuantiles {
  import ColumnBridge.{column, expression => e}
  def kllQuantilesF(sketch: Column, probs: Seq[Double]): Column =
    column(KllQuantiles(e(sketch), probs))
}

/** kll_rank(sketch, value) → double: the inclusive normalized rank of
  * `value` in the sketched distribution (the percentile-rank read off
  * a persisted KLL artifact). Empty sketch → null.
  */
case class KllRank(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kll_rank"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, double), got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = KllOps.rank(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Double])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double graftKllR = graft.expressions.KllOps.rank($a, $b);
         |if (graftKllR == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = graftKllR.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): KllRank =
    copy(left = newLeft, right = newRight)
}

object KllRank {
  import ColumnBridge.{column, expression => e}
  def kllRankF(sketch: Column, value: Column): Column =
    column(KllRank(e(sketch), e(value)))
}

/** kll_merge(a, b) → binary: merge two KLL sketches (both non-null;
  * callers coalesce absent sides first).
  */
case class KllMerge(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_kll_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, binary), got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    KllOps.merge(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.KllOps.merge($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): KllMerge =
    copy(left = newLeft, right = newRight)
}

object KllMerge {
  import ColumnBridge.{column, expression => e}
  def kllMergeF(a: Column, b: Column): Column = column(KllMerge(e(a), e(b)))
}
