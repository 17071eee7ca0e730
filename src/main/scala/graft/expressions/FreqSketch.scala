package graft.expressions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch, LongsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy-hitter) sketch — DataSketches' Misra-Gries
  * family (Anderson et al., "A High-Performance Algorithm for
  * Identifying Frequent Items in Data Streams", IMC 2017) — as a ONE-
  * pass mergeable aggregate.
  *
  * Complements [[graft.hash.GraftCms]]: CMS answers "how often does
  * KEY k occur?" (you must already hold k) and graft's CMS
  * heavyHitters therefore re-scans the data to enumerate candidates;
  * the frequent-items sketch DISCOVERS the heavy keys in the same
  * single pass that counts them, and merges across
  * partitions/crawls. Error model is two-sided deterministic (not
  * probabilistic): every estimate satisfies est−maxError ≤ true ≤
  * est, with maxError = 0 while the item map never purged — so a
  * sketch sized above the distinct-key count is EXACT, which is what
  * makes q_freq_items oracle-checkable.
  *
  * Payloads are tagged ('L' = LongsSketch over bigint keys — a
  * primitive-map fast path — 'S' = ItemsSketch<String>) so a
  * persisted sketch is self-describing.
  */
object FreqOps {
  final val TagLong: Byte = 'L'.toByte
  final val TagString: Byte = 'S'.toByte

  private val serde = new ArrayOfStringsSerDe

  def serialize(buf: AnyRef): Array[Byte] = buf match {
    case s: LongsSketch =>
      val b = s.toByteArray
      val out = new Array[Byte](b.length + 1)
      out(0) = TagLong; System.arraycopy(b, 0, out, 1, b.length); out
    case s: ItemsSketch[_] =>
      val b = s.asInstanceOf[ItemsSketch[String]].toByteArray(serde)
      val out = new Array[Byte](b.length + 1)
      out(0) = TagString; System.arraycopy(b, 0, out, 1, b.length); out
    case other => throw new IllegalStateException(s"not a frequency sketch: $other")
  }

  def deserialize(bytes: Array[Byte]): AnyRef = {
    require(bytes.length > 1, "truncated frequency-sketch payload")
    val body = java.util.Arrays.copyOfRange(bytes, 1, bytes.length)
    bytes(0) match {
      case TagLong => LongsSketch.getInstance(Memory.wrap(body))
      case TagString => ItemsSketch.getInstance(Memory.wrap(body), serde)
      case t => throw new IllegalArgumentException(
        s"unknown frequency-sketch tag $t (expected 'L' or 'S')")
    }
  }

  /** Merge two serialized sketches (same tag required). */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a(0) == b(0),
      s"cannot merge frequency sketches of different item types (${a(0).toChar} vs ${b(0).toChar})")
    (deserialize(a), deserialize(b)) match {
      case (x: LongsSketch, y: LongsSketch) => serialize(x.merge(y))
      case (x: ItemsSketch[_], y: ItemsSketch[_]) =>
        serialize(x.asInstanceOf[ItemsSketch[String]]
          .merge(y.asInstanceOf[ItemsSketch[String]]))
      case _ => throw new IllegalStateException("tag/payload mismatch")
    }
  }

  /** Items with estimate ≥ threshold as rows of
    * (item string, est, lb, ub). noFalsePositives=true → every
    * returned item truly meets the threshold (possibly missing some);
    * false → every qualifying item is returned (possibly with
    * extras). Identical sets when the sketch is exact.
    */
  def topItems(bytes: Array[Byte], threshold: Long,
               noFalsePositives: Boolean): GenericArrayData = {
    val et = if (noFalsePositives) ErrorType.NO_FALSE_POSITIVES else ErrorType.NO_FALSE_NEGATIVES
    val rows: Array[AnyRef] = deserialize(bytes) match {
      case s: LongsSketch =>
        s.getFrequentItems(threshold, et).map { r =>
          new GenericInternalRow(Array[Any](
            UTF8String.fromString(r.getItem.toString),
            r.getEstimate, r.getLowerBound, r.getUpperBound)): AnyRef
        }
      case s: ItemsSketch[_] =>
        s.asInstanceOf[ItemsSketch[String]].getFrequentItems(threshold, et).map { r =>
          new GenericInternalRow(Array[Any](
            UTF8String.fromString(r.getItem),
            r.getEstimate, r.getLowerBound, r.getUpperBound)): AnyRef
        }
    }
    new GenericArrayData(rows)
  }

  /** The sketch's deterministic error half-width (0 ⇒ exact). */
  def maxError(bytes: Array[Byte]): Long = deserialize(bytes) match {
    case s: LongsSketch => s.getMaximumError
    case s: ItemsSketch[_] => s.asInstanceOf[ItemsSketch[String]].getMaximumError
  }
}

/** freq_sketch_agg(v, maxMapSize) → binary: a frequent-items sketch of
  * the values of `v` per group. maxMapSize (power of 2) bounds memory
  * at ~18 bytes/slot and sets the deterministic error bound
  * ≤ 3.5·streamLength/maxMapSize; a map never filled past 75% never
  * purges ⇒ exact. Nulls are skipped; empty input → empty sketch.
  */
case class FreqItemsAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[AnyRef] with UnaryLike[Expression] {

  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    s"maxMapSize must be a power of 2 >= 8, got $maxMapSize")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires long/string input, got ${other.simpleString} " +
        "(cast narrower integrals to long)")
  }

  override def createAggregationBuffer(): AnyRef = child.dataType match {
    case LongType => new LongsSketch(maxMapSize)
    case StringType => new ItemsSketch[String](maxMapSize)
  }

  override def update(buffer: AnyRef, input: InternalRow): AnyRef = {
    val v = child.eval(input)
    if (v != null) buffer match {
      case s: LongsSketch => s.update(v.asInstanceOf[Long])
      case s: ItemsSketch[_] =>
        s.asInstanceOf[ItemsSketch[String]].update(v.asInstanceOf[UTF8String].toString)
    }
    buffer
  }

  override def merge(buffer: AnyRef, other: AnyRef): AnyRef = (buffer, other) match {
    case (x: LongsSketch, y: LongsSketch) => x.merge(y)
    case (x: ItemsSketch[_], y: ItemsSketch[_]) =>
      x.asInstanceOf[ItemsSketch[String]].merge(y.asInstanceOf[ItemsSketch[String]])
    case _ => throw new IllegalStateException("mismatched frequency-sketch buffers")
  }

  override def eval(buffer: AnyRef): Any = FreqOps.serialize(buffer)

  override def serialize(buffer: AnyRef): Array[Byte] = FreqOps.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): AnyRef = FreqOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqItemsAgg =
    copy(child = newChild)
}

object FreqItemsAgg {
  import ColumnBridge.{column, expression => e}
  def freqAggF(v: Column, maxMapSize: Int): Column =
    column(FreqItemsAgg(e(v), maxMapSize).toAggregateExpression())
}

/** freq_top_items(sketch, threshold, noFalsePositives) →
  * array<struct<item string, est, lb, ub>>: the sketch's items with
  * estimate ≥ threshold (items render as strings so one output type
  * covers both key kinds; cast back as needed). null sketch → null.
  */
case class FreqTopItems(child: Expression, threshold: Long, noFalsePositives: Boolean)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_freq_top_items"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary frequency sketch, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    FreqOps.topItems(v.asInstanceOf[Array[Byte]], threshold, noFalsePositives)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.FreqOps.topItems($c, ${threshold}L, $noFalsePositives)")

  override protected def withNewChildInternal(newChild: Expression): FreqTopItems =
    copy(child = newChild)
}

object FreqTopItems {
  import ColumnBridge.{column, expression => e}
  def freqTopItemsF(sketch: Column, threshold: Long,
                    noFalsePositives: Boolean = true): Column =
    column(FreqTopItems(e(sketch), threshold, noFalsePositives))
}

/** freq_merge(a, b) → binary: merge two frequency sketches of the same
  * item type. Callers route null sides before this (coalesce) — both
  * inputs must be non-null.
  */
case class FreqMerge(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_freq_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, binary), got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    FreqOps.merge(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.FreqOps.merge($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FreqMerge =
    copy(left = newLeft, right = newRight)
}

object FreqMerge {
  import ColumnBridge.{column, expression => e}
  def freqMergeF(a: Column, b: Column): Column = column(FreqMerge(e(a), e(b)))
}
