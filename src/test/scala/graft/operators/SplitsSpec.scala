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

  test("sampleQuota: exact per-stratum quotas, partition-stable, group-limit planned") {
    val df = (1L to 1000L).map(i => (i, s"s${i % 3}")).toDF("id", "stratum")
    val out = Splits.sampleQuota(df, "stratum", "id", n = 10, seed = "q")
    val counts = out.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(counts.values.toSet == Set(10L))
    // reproducible across partitioning
    val again = Splits.sampleQuota(df.repartition(17), "stratum", "id", 10, "q")
      .select("id").as[Long].collect().sorted.toSeq
    assert(again == out.select("id").as[Long].collect().sorted.toSeq)
    // a stratum smaller than the quota keeps all its rows
    val tiny = Splits.sampleQuota(Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "stratum"),
      "stratum", "id", 5, "q")
    assert(tiny.count() == 3)
    // per-task pruning: the rank filter plans as a group limit
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$plan")
  }

  test("guards: empty splits, non-positive weight, column collision") {
    val df = Seq(1L).toDF("id")
    intercept[IllegalArgumentException](Splits.thresholds(Nil))
    intercept[IllegalArgumentException](Splits.thresholds(Seq("a" -> 0.0)))
    intercept[IllegalArgumentException](Splits.assignSplit(
      df.withColumn("split", lit("x")), "id", splits, "s"))
  }
}
