package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** gram_hashes(tokenHashes, k) → array<long>: the positional k-gram
  * hashes of a token-hash array as ONE fused loop — the hot kernel
  * under shingling (MinHash dedup) and substring-dup statistics.
  *
  * Bit-identical to the composed form it replaces
  * (`transform(sequence(…), i => xxhash64(element_at(arr, i+1), …,
  * element_at(arr, i+k)))`, asserted in GramHashesSpec): Spark's
  * `xxhash64(c1…ck)` folds `h = XXH64.hashLong(cj, h)` from seed 42,
  * which is exactly the inner loop here. The composed form is the §4
  * HOF trap — `transform` is interpreted, each gram re-evaluates k
  * boxed `element_at` trees; this is one straight-line loop over the
  * backing array inside whole-stage codegen.
  *
  * `padShort = true` is [[graft.dedup.Dedup.shingleRows]]' contract: a
  * doc with fewer than k tokens contributes ONE gram hashing its
  * available token hashes (the composed form's nulls-skipped
  * `try_element_at` chain — an empty array folds to the bare seed), so
  * no doc vanishes. `padShort = false` is the strict contract
  * (substring stats): fewer than k tokens → no grams.
  */
case class GramHashes(child: Expression, k: Int, padShort: Boolean)
  extends UnaryExpression {

  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_gram_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> (token hashes), got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    GramHashes.compute(v.asInstanceOf[ArrayData], k, padShort)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.GramHashes.compute($c, $k, $padShort)")

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

object GramHashes {
  private val Seed = 42L // xxhash64's fixed seed

  /** One pass over the backing array; n-k+1 grams (or the padShort
    * single short gram). Token-hash elements are non-null by
    * construction (they come from xxhash64).
    */
  def compute(arr: ArrayData, k: Int, padShort: Boolean): ArrayData = {
    val n = arr.numElements()
    if (n < k) {
      if (!padShort) return new GenericArrayData(Array.emptyLongArray)
      // one gram over the 0..n-1 prefix; empty array folds to the seed
      var h = Seed
      var j = 0
      while (j < n) { h = XXH64.hashLong(arr.getLong(j), h); j += 1 }
      return new GenericArrayData(Array(h))
    }
    val out = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      var h = Seed
      var j = i
      val end = i + k
      while (j < end) { h = XXH64.hashLong(arr.getLong(j), h); j += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  import ColumnBridge.{column, expression => e}
  def gramHashesF(tokenHashes: Column, k: Int, padShort: Boolean): Column =
    column(GramHashes(e(tokenHashes), k, padShort))
}
