package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** simhash_agg(h) → bigint: the packed 64-bit SimHash as ONE
  * aggregate — bit b of the result is set iff the sum over input rows
  * of (+1 when bit b of h is set, −1 otherwise) is positive.
  *
  * Replaces 64 conditional-sum aggregate columns + a 64-term pack
  * expression (same Janino-width pathology as the MinHash column
  * form — see [[MinHashAgg]]). The vote accumulator is a long[64]
  * with elementwise-sum merge, partial-aggregated map-side; ties
  * (vote sum 0) clear the bit, matching `when(vote > 0, …)`.
  * Null inputs are skipped, matching sum's null handling.
  */
case class SimHashAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_simhash_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input (a precomputed hash), got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < 64) {
        buffer(b) += (if (((h >>> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var b = 0
    while (b < 64) { buffer(b) += other(b); b += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    var packed = 0L
    var b = 0
    while (b < 64) {
      if (buffer(b) > 0L) packed |= 1L << b
      b += 1
    }
    packed
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * 64)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](64)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
    copy(child = newChild)
}

object SimHashAgg {
  import ColumnBridge.{column, expression => e}
  /** Column-level entry point. */
  def simhashAggF(h: Column): Column =
    column(SimHashAgg(e(h)).toAggregateExpression())
}
