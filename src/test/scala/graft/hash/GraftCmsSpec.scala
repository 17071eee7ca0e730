package graft.hash

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraftCmsSpec extends SparkSpec {
  import spark.implicits._

  // skewed corpus: key k appears k times, k in 1..100
  private lazy val skewed = spark.range(1, 101)
    .select(explode(sequence(lit(1), col("id"))).as("rep"), col("id").as("k"))
    .select(col("k"))

  test("estimates never undercount, and stay near truth at the chosen eps") {
    val cms = GraftCms.build(skewed, "k", eps = 1e-4, confidence = 0.999)
    val ests = (1L to 100L).map(k => k -> cms.estimateCount(java.lang.Long.valueOf(k)))
    assert(ests.forall { case (k, e) => e >= k }) // estimate >= true count
    // N = 5050 rows; eps*N ≈ 0.5 → estimates are exact here
    assert(ests.count { case (k, e) => e == k } == 100)
  }

  test("heavyHitters is exact: every key >= minCount, exact counts, nothing extra") {
    val got = GraftCms.heavyHitters(skewed, "k", minCount = 60, eps = 1e-4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (60L to 100L).map(k => k -> k).toMap)
  }

  test("heavyHitters with a coarse sketch still returns the exact answer") {
    // eps 0.05 → overcount up to ~250 on N=5050: lots of false
    // candidates admitted, all removed by the exact HAVING
    val got = GraftCms.heavyHitters(skewed, "k", minCount = 90, eps = 0.05)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (90L to 100L).map(k => k -> k).toMap)
  }

  test("heavyHitters keeps a heavy NULL group (SQL GROUP BY semantics)") {
    // the sketch never sees nulls (a null probe estimates 0), so null
    // rows must bypass the prefilter and resolve in the exact agg
    val withNulls = skewed.select(
      when(col("k") <= 95, col("k")).as("k")) // keys 1..95 + 490 null rows
    val got = GraftCms.heavyHitters(withNulls, "k", minCount = 90, eps = 1e-4)
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getLong(1))
      .toMap
    val nullCount = (96L to 100L).sum // 490
    assert(got(None) == nullCount, s"null group missing or wrong: $got")
    val expected: Map[Option[Long], Long] =
      (90L to 95L).map(k => (Some(k): Option[Long]) -> k).toMap + (None -> nullCount)
    assert(got == expected)
    // and a LIGHT null group still dies on the exact HAVING
    val few = Seq(Some(1L), Some(1L), Some(1L), None).toDF("k")
    val light = GraftCms.heavyHitters(few, "k", minCount = 2)
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))))
    assert(light.toSet == Set(Some(1L)))
  }

  test("string keys build and probe with the same representation") {
    val words = Seq.fill(50)("hot") ++ Seq("cold1", "cold2", "cold3")
    val df = words.toDF("w")
    val cms = GraftCms.build(df, "w", eps = 1e-3)
    val est = df.select(GraftCms.estimate(df, "w", cms).as("e"), col("w"))
      .filter(col("w") === "hot").select("e").as[Long].head()
    assert(est >= 50L && est <= 53L)
    val hh = GraftCms.heavyHitters(df, "w", minCount = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(hh.toSeq == Seq(("hot", 50L)))
  }

  test("write/read roundtrip preserves the sketch exactly") {
    val cms = GraftCms.build(skewed, "k", eps = 1e-4)
    val d = java.nio.file.Files.createTempDirectory("graft_cms").toFile
    d.deleteOnExit()
    val path = s"${d.getAbsolutePath}/counts.cms"
    GraftCms.write(spark, cms, path)
    val back = GraftCms.read(spark, path)
    assert(back == cms) // CountMinSketchImpl equality: same tables
    val got = GraftCms.heavyHitters(skewed, "k", minCount = 95, sketch = Some(back))
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (95L to 100L))
  }

  test("estimate kernel stays inside whole-stage codegen, no UDF") {
    val cms = GraftCms.build(skewed, "k", eps = 1e-3)
    val plan = skewed.filter(GraftCms.estimate(skewed, "k", cms) >= 60)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_cms_estimate"))
    assert(!plan.contains("UDF"), s"UDF in CMS plan:\n$plan")
    assert(plan.linesIterator.exists(l => l.contains("graft_cms_estimate") && l.contains("*(")),
      s"CMS filter not codegen'd:\n$plan")
  }

  test("unsupported key types are rejected up front") {
    val df = Seq(1.5).toDF("k")
    val e = intercept[IllegalArgumentException](GraftCms.build(df, "k"))
    assert(e.getMessage.contains("unsupported type"))
  }
}
