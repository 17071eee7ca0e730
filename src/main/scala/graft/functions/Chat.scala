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
    def tagOf(turn: Column): Column =
      when(turn.getField("role") === assistantRole, lit(assistantTag))
        .otherwise(lit(userTag))
    def contentOf(turn: Column): Column =
      coalesce(turn.getField("content"), lit(""))
    // the text builds ONCE from per-turn pieces (a fold that
    // re-concatenated the accumulated string each turn would copy
    // O(turns²) characters); the fold below carries only a running
    // character position and the span array — pure integer work
    val text = array_join(
      transform(conv, t => concat(tagOf(t), contentOf(t), lit(sep))), "")
    val init = struct(lit(0L).as("pos"),
      array().cast("array<struct<lo:long,hi:long>>").as("spans"))
    val folded = aggregate(conv, init, (acc, turn) => {
      val lo = acc.getField("pos") + length(tagOf(turn)).cast("long")
      val hi = lo + length(contentOf(turn)).cast("long")
      val spans = when(turn.getField("role") === assistantRole,
        concat(acc.getField("spans"), array(struct(lo.as("lo"), hi.as("hi")))))
        .otherwise(acc.getField("spans"))
      struct((hi + lit(sep.length.toLong)).as("pos"), spans.as("spans"))
    })
    struct(text.as("text"), folded.getField("spans").as("spans"))
  }
}
