package graft.hash

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScalableBloomSpec extends SparkSpec {
  import spark.implicits._

  test("repeated items do not grow the stack (reference contract)") {
    val sbf = ScalableBloom(256, 0.01)
    assert(sbf.numFilters == 0)
    assert(sbf.approximateElementCount == 0)
    (0 to 100).foreach(_ => sbf.putString("test"))
    assert(sbf.mightContainString("test"))
    assert(sbf.numFilters == 1)
    assert(sbf.approximateElementCount == 1)
  }

  test("grows geometrically at the given growth rate") {
    val sbf = ScalableBloom(2, 0.001, growthRate = 2, tighteningRatio = 1.0)
    (0 until 100).foreach(i => sbf.putString("item" + i))
    assert(sbf.numFilters == 6) // 2+4+8+16+32+64 = 126 >= 100
    val sbf4 = ScalableBloom(2, 0.001, growthRate = 4, tighteningRatio = 1.0)
    (0 until 100).foreach(i => sbf4.putString("item" + i))
    assert(sbf4.numFilters == 4) // 2+8+32+128 >= 100
  }

  test("no false negatives across the stack; fp rate stays bounded") {
    val sbf = ScalableBloom(64, 0.001)
    val rnd = new scala.util.Random(42)
    val items = (0 until 500).map(_ => "key-" + rnd.nextLong())
    items.foreach(sbf.putString)
    assert(items.forall(sbf.mightContainString))
    val fp = (0 until 20000).count(i => sbf.mightContainString("absent-" + i))
    // compounded bound ≈ fpp/(1-r) = 0.002; allow generous slack
    assert(fp < 20000 * 0.02, s"false-positive count $fp too high")
  }

  test("longs and strings insert/probe with the GraftBloom representation") {
    val sbf = ScalableBloom(100, 0.01)
    (0L until 50L).foreach(sbf.putLong)
    assert((0L until 50L).forall(sbf.mightContainLong))
    assert(sbf.approximateElementCount == 50)
  }

  test("write/read roundtrip preserves stack, counts, and membership") {
    val sbf = ScalableBloom(16, 0.01)
    (0 until 100).foreach(i => sbf.putString("doc" + i))
    val d = java.nio.file.Files.createTempDirectory("graft_sbf").toFile
    d.deleteOnExit()
    val path = s"${d.getAbsolutePath}/stack.sbf"
    sbf.write(spark, path)
    val back = ScalableBloom.read(spark, path)
    assert(back.numFilters == sbf.numFilters)
    assert(back.approximateElementCount == sbf.approximateElementCount)
    assert((0 until 100).forall(i => back.mightContainString("doc" + i)))
    assert(back.initialCapacity == 16 && back.growthRate == 2)
    // a loaded stack keeps accepting inserts
    back.putString("new-item")
    assert(back.mightContainString("new-item"))
  }

  test("Dataset probe ORs the stacked filters inside codegen, no false negatives") {
    val sbf = ScalableBloom(8, 0.01) // small: forces several slices
    (0L until 64L).foreach(sbf.putLong)
    assert(sbf.numFilters > 1)
    val df = spark.range(0, 1000).select(col("id").as("k"))
    val kept = sbf.filterByBloom(df, "k").as[Long].collect().toSet
    assert((0L until 64L).toSet.subsetOf(kept)) // every member survives
    assert(kept.size < 1000)                    // non-members mostly rejected
    val plan = sbf.filterByBloom(df, "k").queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_probe") && !plan.contains("UDF"))
  }

  test("empty-stack probe is rejected loudly") {
    val sbf = ScalableBloom(8, 0.01)
    val e = intercept[IllegalArgumentException] {
      sbf.probe(spark.range(1).select(col("id").as("k")), "k")
    }
    assert(e.getMessage.contains("empty"))
  }
}
