package graft.hash

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraftBloomSpec extends SparkSpec {
  import spark.implicits._

  private def tmpPath(leaf: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_bloom_spec").toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/$leaf"
  }

  test("build → write → read roundtrip preserves the filter exactly") {
    val keys = spark.range(0, 10000).select(col("id").as("k"))
    val bf = GraftBloom.build(keys, "k", expectedKeys = 10000L, fpp = 0.01)
    val path = tmpPath("keys.bloom")
    GraftBloom.write(spark, bf, path)
    val loaded = GraftBloom.read(spark, path)
    assert(loaded == bf) // BloomFilterImpl equality: same bits, same hash count
    // no false negatives through the loaded artifact
    val misses = GraftBloom.filterNotByBloom(keys, "k", loaded).count()
    assert(misses == 0L)
  }

  test("false-positive rate of the persisted filter stays near the build fpp") {
    val keys = spark.range(0, 50000).select(col("id").as("k"))
    val bf = GraftBloom.build(keys, "k", expectedKeys = 50000L, fpp = 0.01)
    val path = tmpPath("fpp.bloom")
    GraftBloom.write(spark, bf, path)
    val loaded = GraftBloom.read(spark, path)
    // disjoint probe range: every hit is a false positive
    val probes = spark.range(1000000, 1100000).select(col("id").as("k"))
    val fp = GraftBloom.filterByBloom(probes, "k", loaded).count()
    assert(fp < 100000L * 0.05, s"false-positive count $fp exceeds 5x the 1% build fpp")
  }

  test("string keys roundtrip with the same representation as the build") {
    val keys = Seq("alpha", "beta", "gamma").toDF("k")
    val bf = GraftBloom.build(keys, "k", expectedKeys = 100L, fpp = 0.01)
    val path = tmpPath("str.bloom")
    GraftBloom.write(spark, bf, path)
    val loaded = GraftBloom.read(spark, path)
    val probe = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "omega").toDF("k")
    val kept = GraftBloom.filterByBloom(probe, "k", loaded).as[String].collect().toSet
    assert(Set("alpha", "beta", "gamma").subsetOf(kept)) // no false negatives
    assert(kept.size <= 4) // tiny filter: at most stray fp
  }

  test("prefilter + exact join == exact join (false positives cancel)") {
    import graft.syntax._
    val members = spark.range(0, 1000).filter(col("id") % 7 === 0).select(col("id").as("k"))
    val big = spark.range(0, 5000).select(col("id").as("k"), (col("id") * 2).as("v"))
    val bf = GraftBloom.build(members, "k", expectedKeys = 1000L, fpp = 0.05)
    val exact = big.join(members, Seq("k"), "left_semi")
    val prefiltered = big.filterByBloom("k", bf).join(members, Seq("k"), "left_semi")
    assert(prefiltered.collect().map(_.toSeq).toSet == exact.collect().map(_.toSeq).toSet)
  }

  test("probe stays inside whole-stage codegen (no UDF, no extra exchange)") {
    val keys = spark.range(0, 100).select(col("id").as("k"))
    val bf = GraftBloom.build(keys, "k", expectedKeys = 100L, fpp = 0.01)
    val plan = GraftBloom.filterByBloom(spark.range(0, 1000).select(col("id").as("k")), "k", bf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_probe"))
    assert(!plan.contains("UDF"), s"UDF found in probe plan:\n$plan")
    // the probing Filter is inside a whole-stage-codegen span ("*(n)")
    assert(plan.linesIterator.exists(l => l.contains("graft_bloom_probe") && l.contains("*(")),
      s"probe filter not codegen'd:\n$plan")
  }

  test("binary keys are rejected at build time with a clear error") {
    val bin = Seq(Array[Byte](1, 2)).toDF("k")
    val e = intercept[IllegalArgumentException] {
      GraftBloom.build(bin, "k", expectedKeys = 10L)
    }
    assert(e.getMessage.contains("unsupported type"))
  }
}
