package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen
  * expression — the canonicalization step every text-dedup key needs
  * (the same logical text can arrive precomposed or decomposed from
  * different crawls; exact/MinHash dedup keyed on raw bytes treats
  * them as distinct documents). A Scala UDF would box every row and
  * break whole-stage codegen; this stays inside the generated plan and
  * short-circuits the overwhelmingly common pure-ASCII row without
  * ever materializing a java.lang.String.
  *
  * Reference behavior: scio pipelines reach for
  * `java.text.Normalizer` inside `map` (user code over
  * scio-core SCollection.scala map); graft ships it as an engine
  * function (`graft_normalize(text, 'NFC')` in SQL,
  * [[graft.functions.TextClean.normalizeText]] composed on top).
  */
case class UnicodeNormalize(child: Expression, form: String)
  extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.simpleString}")
    else if (!UnicodeNormalize.FormNames.contains(form.toUpperCase))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName form must be one of ${UnicodeNormalize.FormNames.mkString("/")}, got '$form'")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val formOrdinal: Int = UnicodeNormalize.ordinal(form)

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], formOrdinal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.UnicodeNormalize.normalize($c, $formOrdinal)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {

  val FormNames: Seq[String] = Seq("NFC", "NFD", "NFKC", "NFKD")

  private val Forms: Array[Normalizer.Form] = Array(
    Normalizer.Form.NFC, Normalizer.Form.NFD,
    Normalizer.Form.NFKC, Normalizer.Form.NFKD)

  def ordinal(form: String): Int = {
    val i = FormNames.indexOf(form.toUpperCase)
    require(i >= 0, s"unknown normalization form '$form' (use ${FormNames.mkString("/")})")
    i
  }

  /** Called from generated code — one invocation per row. ASCII is
    * closed under every normalization form, so a byte-count ==
    * char-count input (no multi-byte sequences) returns unchanged
    * without allocating; already-normalized non-ASCII text returns the
    * original UTF8String after the (allocation-light) quick check.
    */
  def normalize(s: UTF8String, form: Int): UTF8String = {
    if (s.numBytes == s.numChars()) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Forms(form))) s
    else UTF8String.fromString(Normalizer.normalize(str, Forms(form)))
  }

  /** Column form: `normalizeF(col("text"), "NFC")`. */
  def normalizeF(c: Column, form: String): Column = {
    ordinal(form) // validate eagerly — a bad form should fail at plan build
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), form))
  }
}
