package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** excise_tokens(units, positions, k) → array<string>: the units that
  * survive removing every k-wide span starting at `positions` — the
  * rebuild kernel under substring/sentence span dedup
  * ([[graft.dedup.Dedup.removeDuplicateSpans]] family).
  *
  * One straight-line pass: sort the positions, sweep them as merged
  * half-open [p, p+k) intervals, and copy the complement — O(n + m
  * log m) per doc with a single output allocation. The composed form
  * this replaces (an `aggregate` fold building an interval array, a
  * second fold complementing it, then slice+flatten) is the §4 HOF
  * trap again: interpreted, and its accumulator CONCATENATES a fresh
  * array per dup position, going quadratic exactly on the
  * boilerplate-heavy docs with thousands of dup positions that a
  * 100 TB corpus is guaranteed to contain.
  *
  * Position lists come from gram explodes, so every p is in
  * [0, n-k]; out-of-range values are clamped defensively. An empty
  * position list returns the input array unchanged.
  */
case class ExciseTokens(left: Expression, right: Expression, k: Int)
  extends BinaryExpression {

  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_excise_tokens"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, array<bigint>), got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }

  override def nullSafeEval(toks: Any, pos: Any): Any =
    ExciseTokens.compute(toks.asInstanceOf[ArrayData], pos.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p) => s"graft.expressions.ExciseTokens.compute($t, $p, $k)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ExciseTokens =
    copy(left = newLeft, right = newRight)
}

object ExciseTokens {

  def compute(toks: ArrayData, pos: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    val m = pos.numElements()
    if (m == 0 || n == 0) return toks
    val ps = new Array[Long](m)
    var i = 0
    while (i < m) { ps(i) = pos.getLong(i); i += 1 }
    java.util.Arrays.sort(ps)
    val out = new Array[AnyRef](n)
    var nOut = 0
    var cur = 0L // next position not yet copied or covered
    i = 0
    while (i < m) {
      var s = ps(i)
      var e = s + k
      while (i + 1 < m && ps(i + 1) <= e) { // merge overlapping/adjacent spans
        i += 1
        val e2 = ps(i) + k
        if (e2 > e) e = e2
      }
      if (s < cur) s = cur
      var j = cur
      val stop = math.min(s, n.toLong)
      while (j < stop) {
        out(nOut) = toks.get(j.toInt, StringType)
        nOut += 1
        j += 1
      }
      if (e > cur) cur = math.min(e, n.toLong)
      i += 1
    }
    var j = cur
    while (j < n) {
      out(nOut) = toks.get(j.toInt, StringType)
      nOut += 1
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, nOut))
  }

  import ColumnBridge.{column, expression => e}
  def exciseF(units: Column, positions: Column, k: Int): Column =
    column(ExciseTokens(e(units), e(positions), k))
}
