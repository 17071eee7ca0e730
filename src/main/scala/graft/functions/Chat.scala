package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Chat/SFT rendering — the step between a conversation table and the
  * tokenizer: flatten an `array<struct<role, content>>` conversation
  * into ONE training string with role tags, and emit the character
  * spans of the assistant turns (the loss-mask intervals an SFT
  * trainer needs — loss on assistant tokens only). The reference has
  * no counterpart (scio users hand-roll the fold); graft ships it
  * because every instruction-tuning pipeline runs exactly this.
  *
  * Pure per-row builtin expressions (one `aggregate` fold over the
  * turns — single-pass per the SURVEY §4 HOF rule): no UDF, no
  * shuffle, linear in conversation length.
  */
object Chat {

  /** Renders `conv` (array of struct with fields `role`, `content`)
    * into struct(text, spans): text = Σ tag(role) + content + sep;
    * spans = array<struct<lo, hi>> of 0-based [lo, hi) character
    * intervals covering each `assistantRole` turn's CONTENT (tags and
    * separators stay outside the mask). Null contents render as ""
    * (empty turn, empty span kept — the turn count is preserved).
    * Unknown roles take the user tag.
    */
  def render(conv: Column,
             userTag: String = "<|user|>\n",
             assistantTag: String = "<|assistant|>\n",
             sep: String = "\n",
             assistantRole: String = "assistant"): Column = {
    val init = struct(lit("").as("text"),
      array().cast("array<struct<lo:long,hi:long>>").as("spans"))
    aggregate(conv, init, (acc, turn) => {
      val role = turn.getField("role")
      val content = coalesce(turn.getField("content"), lit(""))
      val tag = when(role === assistantRole, lit(assistantTag)).otherwise(lit(userTag))
      val lo = length(acc.getField("text")).cast("long") + length(tag)
      val hi = lo + length(content)
      val newSpans = when(role === assistantRole,
        concat(acc.getField("spans"),
          array(struct(lo.as("lo"), hi.as("hi")))))
        .otherwise(acc.getField("spans"))
      struct(
        concat(acc.getField("text"), tag, content, lit(sep)).as("text"),
        newSpans.as("spans"))
    })
  }
}
