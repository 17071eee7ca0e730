package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** minhash_agg(h) → array<long>: the full MinHash signature as ONE
  * aggregate — sig(j) = min over input rows of xxhash64(h, j), for
  * j in [0, numHashes).
  *
  * Replaces `numHashes` separate min(xxhash64(h, j)) aggregate
  * columns. Same values bit-for-bit (asserted in MinHashAggSpec):
  * Spark's xxhash64(h, j) chains XXH64.hashLong(j, hashLong(h, seed)),
  * so the per-row base hashLong(h, seed) is shared here and each row
  * costs numHashes+1 hashes instead of 2·numHashes. The bigger win is
  * plan shape: a 128-agg HashAggregate generates a huge Janino class
  * (seconds of compile, JIT-hostile width); this is a single
  * expression over a long[numHashes] buffer with elementwise-min
  * merge, partial-aggregated map-side like any other aggregate.
  *
  * Null contract (mirrors the composed form): a null input leaves the
  * base seed untouched — xxhash64 skips null children — and an EMPTY
  * input relation (global aggregate over zero rows) yields null, as
  * the composed min columns would. The buffer carries the update
  * count in its final slot to distinguish "no rows" from values.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  private val seed = 42L // xxhash64's fixed seed

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // null only for an empty input relation
  override def prettyName: String = "graft_minhash_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input (a precomputed hash), got ${other.simpleString}")
  }

  // slots [0, numHashes) = running minima; slot numHashes = row count
  override def createAggregationBuffer(): Array[Long] = {
    val buf = Array.fill(numHashes + 1)(Long.MaxValue)
    buf(numHashes) = 0L
    buf
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    val base = if (v == null) seed else XXH64.hashLong(v.asInstanceOf[Long], seed)
    var j = 0
    while (j < numHashes) {
      // hashInt, not hashLong: the composed form's lit(j) is an int
      // literal and xxhash64 hashes int children with hashInt.
      val h = XXH64.hashInt(j, base)
      if (h < buffer(j)) buffer(j) = h
      j += 1
    }
    buffer(numHashes) += 1L
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < numHashes) {
      if (other(j) < buffer(j)) buffer(j) = other(j)
      j += 1
    }
    buffer(numHashes) += other(numHashes)
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer(numHashes) == 0L) null
    else new GenericArrayData(java.util.Arrays.copyOf(buffer, numHashes))

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * (numHashes + 1))
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](numHashes + 1)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object MinHashAgg {
  import ColumnBridge.{column, expression => e}
  /** Column-level entry point. */
  def minhashAggF(h: Column, numHashes: Int): Column =
    column(MinHashAgg(e(h), numHashes).toAggregateExpression())
}
