package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ChatSpec extends SparkSpec {
  import spark.implicits._

  private def render(turns: Seq[(String, String)]): (String, Seq[(Long, Long)]) = {
    val conv = (if (turns.isEmpty) array()
      else array(turns.map { case (r, c) =>
        struct(lit(r).as("role"),
          (if (c == null) lit(null).cast("string") else lit(c)).as("content"))
      }: _*)).cast("array<struct<role:string,content:string>>")
    val row = Seq(1).toDF("x").select(Chat.render(conv).as("r"))
      .select(col("r.text"), col("r.spans")).collect()(0)
    (row.getString(0),
      row.getSeq[Row](1).map(s => (s.getLong(0), s.getLong(1))))
  }

  test("hand-checked spans: tags and separators outside the mask") {
    val (text, spans) = render(Seq("user" -> "hi", "assistant" -> "hello"))
    assert(text == "<|user|>\nhi\n<|assistant|>\nhello\n")
    // assistant content starts after 9 (user tag) + 2 + 1 (sep) + 14 (tag)
    assert(spans == Seq((26L, 31L)))
    assert(text.substring(26, 31) == "hello")
  }

  test("every span extracts exactly its turn's content") {
    val turns = Seq("user" -> "ask one", "assistant" -> "answer one",
      "user" -> "ask two", "assistant" -> "answer two!")
    val (text, spans) = render(turns)
    val contents = turns.filter(_._1 == "assistant").map(_._2)
    assert(spans.size == 2)
    spans.zip(contents).foreach { case ((lo, hi), c) =>
      assert(text.substring(lo.toInt, hi.toInt) == c)
    }
  }

  test("randomized conversations: spans always extract their contents") {
    val rnd = new scala.util.Random(11)
    (1 to 20).foreach { trial =>
      val turns = (0 until rnd.nextInt(8) + 1).map { _ =>
        val role = Seq("user", "assistant", "system")(rnd.nextInt(3))
        val content = Seq.fill(rnd.nextInt(6))(
          ("abc xyz! π" + rnd.nextInt(100)).substring(rnd.nextInt(3)))
          .mkString(" ")
        (role, content)
      }
      val (text, spans) = render(turns)
      val assistantContents = turns.filter(_._1 == "assistant").map(_._2)
      assert(spans.size == assistantContents.size, s"trial $trial")
      spans.zip(assistantContents).foreach { case ((lo, hi), c) =>
        assert(text.substring(lo.toInt, hi.toInt) == c, s"trial $trial span ($lo,$hi)")
      }
    }
  }

  test("null content renders empty; empty conversation; unknown role takes user tag") {
    val (t1, s1) = render(Seq("assistant" -> null))
    assert(t1 == "<|assistant|>\n\n")
    assert(s1 == Seq((14L, 14L)), "empty span kept — turn count preserved")
    val (t2, s2) = render(Nil)
    assert(t2 == "" && s2.isEmpty)
    val (t3, s3) = render(Seq("system" -> "be nice"))
    assert(t3 == "<|user|>\nbe nice\n" && s3.isEmpty)
  }
}
