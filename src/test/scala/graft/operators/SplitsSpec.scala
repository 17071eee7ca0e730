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

  test("sampleWeightedStable: weight-biased, partitioning-stable, guards bad weights") {
    val rows = (1L to 2000L).map(i => (i, if (i <= 100) 50.0 else 1.0))
    val df = rows.toDF("k", "w")
    val picked = Splits.sampleWeightedStable(df, "k", "w", n = 200, seed = "s")
      .select("k").as[Long].collect().toSet
    // the 100 heavy keys carry ~72% of total mass; most must be picked
    assert(picked.count(_ <= 100L) > 60, s"heavy keys underrepresented: " +
      s"${picked.count(_ <= 100L)}")
    // identical on a different partitioning
    val repart = Splits.sampleWeightedStable(df.repartition(13), "k", "w", 200, "s")
      .select("k").as[Long].collect().toSet
    assert(repart == picked)
    // zero/NaN weights never selected
    val bad = (1L to 50L).map(i => (i, if (i % 2 == 0) 0.0 else 1.0))
    val sel = Splits.sampleWeightedStable(bad.toDF("k", "w"), "k", "w", 50, "s")
      .select("k").as[Long].collect()
    assert(sel.forall(_ % 2 == 1) && sel.length == 25)
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

  // 90/9/1 skew: big=9000, mid=900, small=100 rows
  private def skewed = (1L to 10000L).map { i =>
    val d = if (i <= 9000) "big" else if (i <= 9900) "mid" else "small"
    (i, d)
  }.toDF("id", "domain")

  test("mixtureSample: alpha=1 preserves shares; alpha=0.5 flattens the head") {
    def shares(alpha: Double): Map[String, Double] = {
      val kept = Splits.mixtureSample(skewed, "domain", "id",
        targetRows = 2000L, alpha = alpha, seed = "m")
      val byDomain = kept.groupBy("domain").count().as[(String, Long)].collect().toMap
      val total = byDomain.values.sum.toDouble
      byDomain.view.mapValues(_ / total).toMap
    }
    val s1 = shares(1.0)
    // alpha=1: target share ≈ corpus share (hash sampling noise ~±2%)
    assert(math.abs(s1("big") - 0.90) < 0.03, s"alpha=1 big share: $s1")
    val s05 = shares(0.5)
    // alpha=0.5: q_d ∝ sqrt(p_d) → small/mid gain, big loses
    assert(s05("big") < s1("big") - 0.05, s"alpha=0.5 should flatten: $s05 vs $s1")
    assert(s05("small") > s1("small"), s"small domain should gain: $s05 vs $s1")
  }

  test("mixtureSample: rate caps at 1, epochs reports the uncapped demand") {
    // targetRows >> corpus: every domain caps; all rows kept
    val kept = Splits.mixtureSample(skewed, "domain", "id",
      targetRows = 1000000L, alpha = 0.5, seed = "m")
    assert(kept.count() == 10000L)
    val rates = kept.select("domain", "rate", "epochs").distinct()
      .as[(String, Double, Double)].collect()
    assert(rates.forall(_._2 == 1.0), rates.mkString(","))
    assert(rates.forall(r => r._3 > 1.0), s"epochs must exceed 1 when capped: ${rates.mkString(",")}")
  }

  test("mixtureSample: deterministic and repartition-stable") {
    val a = Splits.mixtureSample(skewed.repartition(13), "domain", "id", 2000L, 0.5, "m")
      .select("id").as[Long].collect().sorted.toSeq
    val b = Splits.mixtureSample(skewed.coalesce(1), "domain", "id", 2000L, 0.5, "m")
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b)
    val c = Splits.mixtureSample(skewed, "domain", "id", 2000L, 0.5, "other")
      .select("id").as[Long].collect().sorted.toSeq
    assert(c != a, "different seed must sample a different set")
  }

  test("mixtureSample: null domain is its own stratum, not silently dropped") {
    val df = Seq((1L, Some("a")), (2L, Some("a")), (3L, None), (4L, None))
      .toDF("id", "domain")
    // budget >> corpus: every domain caps at rate 1 → ALL rows kept,
    // including the null-domain ones
    val kept = Splits.mixtureSample(df, "domain", "id", targetRows = 1000L, 0.5, "m")
    assert(kept.count() == 4L, "null-domain rows must survive the rate join")
  }

  test("mixtureSample: guards") {
    intercept[IllegalArgumentException](
      Splits.mixtureSample(skewed, "domain", "id", 0L, 0.5, "m"))
    intercept[IllegalArgumentException](
      Splits.mixtureSample(skewed, "domain", "id", 10L, 1.5, "m"))
  }

  test("epochOrder is a dense 0..n-1 permutation, stable under repartitioning") {
    val df = (1L to 5000L).toDF("id")
    val a = Splits.epochOrder(df.repartition(17), "id", seed = "e1", numBuckets = 8)
      .select("id", "ord").as[(Long, Long)].collect().toMap
    assert(a.values.toSeq.sorted == (0L until 5000L), "dense permutation")
    val b = Splits.epochOrder(df.coalesce(1), "id", "e1", numBuckets = 8)
      .select("id", "ord").as[(Long, Long)].collect().toMap
    assert(a == b, "repartition-stable")
    // matches the reference order: sort by (md5 coordinate, key)
    val ref = (1L to 5000L).map { id =>
      val h = java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"e1:$id".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 15), 16)
      (h, id)
    }.sorted.map(_._2).zipWithIndex.map { case (id, i) => (id, i.toLong) }.toMap
    assert(a == ref, "order equals the md5 permutation")
  }

  test("epochOrder: a different seed is a different permutation; one bucket still works") {
    val df = (1L to 300L).toDF("id")
    val a = Splits.epochOrder(df, "id", "e1").select("id", "ord")
      .as[(Long, Long)].collect().toMap
    val b = Splits.epochOrder(df, "id", "e2").select("id", "ord")
      .as[(Long, Long)].collect().toMap
    assert(a != b, "seed changes the permutation")
    val one = Splits.epochOrder(df, "id", "e1", numBuckets = 1)
      .select("id", "ord").as[(Long, Long)].collect().toMap
    assert(one == a, "bucket count must not change the order")
  }

  test("epochOrder rejects duplicate and null keys") {
    intercept[IllegalArgumentException](
      Splits.epochOrder(Seq(1L, 2L, 2L).toDF("id"), "id", "s").collect())
    intercept[IllegalArgumentException](
      Splits.epochOrder(Seq(Some(1L), None).toDF("id"), "id", "s").collect())
  }
}
