package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MinHashAgg must reproduce the composed numHashes×min(xxhash64(h,j))
  * aggregation bit-for-bit — the LSH semantics (bucket collisions,
  * cluster assignments) ride on exact signature equality.
  */
class MinHashAggSpec extends SparkSpec {
  import spark.implicits._

  private val n = 16

  private lazy val rows = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id").as("id"), explode(split(coalesce(col("text"), lit("")), "\\s+")).as("tok"))
    .select(col("id"), xxhash64(col("tok")).as("h"))

  test("minhash_agg equals the composed per-column min aggregation bit-for-bit") {
    val native = rows.groupBy("id").agg(MinHashAgg.minhashAggF(col("h"), n).as("sig"))
    val composed = rows.groupBy("id")
      .agg(array((0 until n).map(j => min(xxhash64(col("h"), lit(j)))): _*).as("sig"))
    assert(native.count() == composed.count())
    assert(native.join(composed.withColumnRenamed("sig", "sig2"), Seq("id"))
      .filter(col("sig") =!= col("sig2")).count() == 0L)
  }

  test("minhash_agg null input mirrors xxhash64's null-skip") {
    val df = Seq((1L, Option(7L)), (1L, None)).toDF("id", "h")
    val native = df.groupBy("id").agg(MinHashAgg.minhashAggF(col("h"), 4).as("sig"))
      .select(explode(col("sig"))).as[Long].collect().sorted
    val composed = df.groupBy("id")
      .agg(array((0 until 4).map(j => min(xxhash64(col("h"), lit(j)))): _*).as("sig"))
      .select(explode(col("sig"))).as[Long].collect().sorted
    assert(native.toSeq == composed.toSeq)
  }

  test("minhash_agg rejects non-bigint input") {
    val e = intercept[Exception] {
      Seq(("a", "x")).toDF("id", "h").groupBy("id")
        .agg(MinHashAgg.minhashAggF(col("h"), 4)).collect()
    }
    assert(e.getMessage.contains("bigint"))
  }
}
