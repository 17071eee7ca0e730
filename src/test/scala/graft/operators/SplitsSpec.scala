package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private val splits = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)

  test("every row gets a label and proportions are near the weights") {
    val df = (1L to 20000L).toDF("id")
    val counts = Splits.assignSplit(df, "id", splits, seed = "s")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 20000L)
    assert(math.abs(counts("train") / 20000.0 - 0.8) < 0.01)
    assert(math.abs(counts("valid") / 20000.0 - 0.1) < 0.01)
    assert(math.abs(counts("test") / 20000.0 - 0.1) < 0.01)
  }

  test("assignment is a pure function of (seed, key): partitioning-stable") {
    val df = (1L to 500L).toDF("id")
    val a = Splits.assignSplit(df.repartition(13), "id", splits, "s")
      .orderBy("id").as[(Long, String)].collect().toSeq
    val b = Splits.assignSplit(df.coalesce(1), "id", splits, "s")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(a == b)
    // a different seed reassigns
    val c = Splits.assignSplit(df, "id", splits, "other")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(a != c)
  }

  test("growth-stable: a key keeps its label when the corpus grows") {
    val small = Splits.assignSplit((1L to 100L).toDF("id"), "id", splits, "s")
      .as[(Long, String)].collect().toMap
    val big = Splits.assignSplit((1L to 1000L).toDF("id"), "id", splits, "s")
      .as[(Long, String)].collect().toMap
    (1L to 100L).foreach(k => assert(small(k) == big(k)))
  }

  test("thresholds are exact integers covering the full 32-bit space") {
    val t = Splits.thresholds(splits)
    assert(t.length == 3 && t.last == (1L << 32))
    assert(t == t.sorted)
    // weights need not sum to 1 — normalized internally
    assert(Splits.thresholds(Seq("a" -> 2.0, "b" -> 2.0)) ==
      Seq(1L << 31, 1L << 32))
  }

  test("guards: empty splits, non-positive weight, column collision") {
    val df = Seq(1L).toDF("id")
    intercept[IllegalArgumentException](Splits.thresholds(Nil))
    intercept[IllegalArgumentException](Splits.thresholds(Seq("a" -> 0.0)))
    intercept[IllegalArgumentException](Splits.assignSplit(
      df.withColumn("split", lit("x")), "id", splits, "s"))
  }
}
