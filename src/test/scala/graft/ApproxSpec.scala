package graft

import org.apache.spark.sql.functions._

/** Error bounds for the approximate sketches that can only be
  * rows-only-gated in the oracle harness (engine-specific estimates).
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  private lazy val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")

  test("approx_count_distinct (HLL++) within 5% of exact") {
    val (approx, exact) = lineitem
      .agg(approx_count_distinct(col("l_partkey")).as("a"),
        countDistinct(col("l_partkey")).as("e"))
      .as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("per-key HLL++ within 5% of exact per key") {
    val merged = lineitem.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("a"),
        countDistinct(col("l_partkey")).as("e"))
      .as[(String, Long, Long)].collect()
    merged.foreach { case (k, a, e) =>
      assert(math.abs(a - e).toDouble / e < 0.05, s"key=$k approx=$a exact=$e")
    }
  }

  test("percentile_approx close to exact percentile") {
    val (approx, exact) = lineitem
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("a"),
        expr("percentile(l_extendedprice, 0.5)").as("e"))
      .as[(Double, Double)].head()
    assert(math.abs(approx - exact) / exact < 0.01, s"approx=$approx exact=$exact")
  }

  test("Bloom filter has no false negatives (sparseJoin's correctness premise)") {
    val keys = spark.read.parquet(s"$sf/part.parquet").select(col("p_brand"))
    val bf = keys.stat.bloomFilter("p_brand", 1000L, 0.03)
    keys.distinct().collect().foreach { r =>
      assert(bf.mightContainString(r.getString(0)))
    }
  }

  test("deterministic hash sample is stable and near the target rate") {
    val df = lineitem.filter(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(10)) === 0)
    val n1 = df.count()
    val n2 = df.count()
    assert(n1 == n2)
    val total = lineitem.count()
    assert(math.abs(n1.toDouble / total - 0.1) < 0.02)
  }
}
