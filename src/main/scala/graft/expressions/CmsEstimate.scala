package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** cms_estimate(key) → bigint: per-row frequency estimate against a
  * driver-built Count-Min sketch, as a native codegen expression —
  * the probe kernel for CMS-guided operators (heavy-hitter
  * prefilters, skew detection), mirroring [[BloomProbe]].
  *
  * Reference intent: scio leans on Algebird CMS for exactly these
  * shapes (scio-extra sparse joins sizing, skewedJoin hot-key
  * detection via CMS in PairSCollectionFunctions). The estimate NEVER
  * undercounts (CMS guarantee: estimate ≥ true count), which is what
  * makes CMS-prefiltered exact operators safe: a threshold filter on
  * the estimate can only admit extra candidates, never drop a true
  * one.
  *
  * Null contract: null key → 0 (a null can't equi-group; callers
  * filtering `estimate >= t` drop it, matching groupBy semantics
  * where null keys form their own group only if present — handle
  * nulls upstream when they matter).
  *
  * The sketch ships to executors inside the stage's task binary via
  * `addReferenceObj`, like the Bloom probe.
  */
case class CmsEstimate(child: Expression, sketch: CountMinSketch) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires long/string/binary key, got ${other.simpleString} " +
        "(cast narrower integrals to long)")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else child.dataType match {
      case LongType => sketch.estimateCount(java.lang.Long.valueOf(v.asInstanceOf[Long]))
      case StringType => sketch.estimateCount(v.asInstanceOf[UTF8String].toString)
      case BinaryType => sketch.estimateCount(v.asInstanceOf[Array[Byte]])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val cmsRef = ctx.addReferenceObj("cms", sketch, classOf[CountMinSketch].getName)
    val est = child.dataType match {
      case LongType => s"$cmsRef.estimateCount(java.lang.Long.valueOf(${childGen.value}))"
      case StringType => s"$cmsRef.estimateCount(${childGen.value}.toString())"
      case BinaryType => s"$cmsRef.estimateCount(${childGen.value})"
    }
    val resultCode =
      code"""
        |${childGen.code}
        |long ${ev.value} = 0L;
        |if (!${childGen.isNull}) { ${ev.value} = $est; }
      """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
