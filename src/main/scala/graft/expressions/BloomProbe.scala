package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** bloom_probe(key) → boolean: membership probe against a driver-built
  * Bloom filter, as a native codegen expression.
  *
  * This is the sparse-join prefilter kernel (scio sparseJoin /
  * sparseLookup / sparseIntersectByKey — reference:
  * scio-core/src/main/scala/com/spotify/scio/values/
  * PairSCollectionFunctions.scala sparse* methods). The composed
  * alternative is a boxed Scala UDF (three virtual calls + boxing per
  * row on the biggest table in the query); Spark's own
  * BloomFilterMightContain is private[sql] and long-only. This
  * expression stays inside whole-stage codegen: one static call on the
  * unboxed key per row.
  *
  * Null contract: null key → false ("absent", never null) — exactly the
  * boxed-UDF behavior it replaces, and what a prefilter needs (a null
  * key can't equi-join, so dropping it is correct for inner/semi and
  * the union-back paths in Joins.sparseJoin re-admit it elsewhere).
  *
  * The filter rides in the expression itself, so it ships to executors
  * once per stage inside the broadcast task binary — the same transport
  * Spark's AQE-injected runtime filters use; no separate broadcast
  * variable needed.
  *
  * Semantics per type (matches what `DataFrame.stat.bloomFilter` put in):
  *   - long: mightContainLong (callers cast narrower integrals to long)
  *   - string: mightContainBinary(utf8Bytes) — identical to
  *     mightContainString, which hashes the UTF-8 bytes
  *   - binary: mightContainBinary — only reachable with a hand-built
  *     filter (Spark 4.1's bloom_filter_agg can't BUILD over binary, so
  *     Joins rejects binary keys up front; the probe itself is exact)
  */
case class BloomProbe(child: Expression, filter: BloomFilter) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_probe"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires long/string/binary key, got ${other.simpleString} " +
        "(cast narrower integrals to long)")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false
    else child.dataType match {
      case LongType => filter.mightContainLong(v.asInstanceOf[Long])
      case StringType => filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
      case BinaryType => filter.mightContainBinary(v.asInstanceOf[Array[Byte]])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val bloomRef = ctx.addReferenceObj("bloom", filter, classOf[BloomFilter].getName)
    val probe = child.dataType match {
      case LongType => s"$bloomRef.mightContainLong(${childGen.value})"
      case StringType => s"$bloomRef.mightContainBinary(${childGen.value}.getBytes())"
      case BinaryType => s"$bloomRef.mightContainBinary(${childGen.value})"
    }
    val resultCode =
      code"""
        |${childGen.code}
        |boolean ${ev.value} = false;
        |if (!${childGen.isNull}) { ${ev.value} = $probe; }
      """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
