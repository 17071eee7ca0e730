package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** md5_head(str, digits) → bigint: the first `digits` hex digits of
  * md5(str) as an unsigned integer — ONE digest + integer fold,
  * bit-identical to the composed
  * `conv(substring(md5(str), 1, digits), 16, 10).cast("long")`
  * (asserted in Md5HeadSpec).
  *
  * This is the deterministic-coordinate kernel under assignSplit /
  * assignShard / sampleQuota / mixtureSample / epochOrder /
  * maskCorrupt / DSIR's feature buckets: md5 stays the CONTRACT
  * (any engine reproduces the arithmetic — the DuckDB oracles do it
  * in SQL), but the composed form pays a hex-string allocation, a
  * substring copy, and conv's arbitrary-base string parse per row —
  * pure overhead on paths evaluated per TOKEN. digits ≤ 15 keeps the
  * value in [0, 2^60) — never negative in a signed long.
  */
case class Md5Head(child: Expression, digits: Int) extends UnaryExpression {

  require(digits >= 1 && digits <= 15, s"digits must be in [1, 15], got $digits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_md5_head"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    Md5Head.compute(v.asInstanceOf[UTF8String], digits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5Head.compute($c, $digits)")

  override protected def withNewChildInternal(newChild: Expression): Md5Head =
    copy(child = newChild)
}

object Md5Head {
  // MessageDigest instances are stateful and not thread-safe; one per
  // task thread, reset()-free because digest() resets
  private val local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def compute(s: UTF8String, digits: Int): Long = {
    val dig = local.get().digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < digits) {
      val b = dig(i >> 1) & 0xFF
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xF)
      i += 1
    }
    v
  }

  import ColumnBridge.{column, expression => e}
  def md5HeadF(str: Column, digits: Int): Column = column(Md5Head(e(str), digits))
}
