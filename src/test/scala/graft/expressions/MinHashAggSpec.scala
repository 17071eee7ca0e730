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

  test("simhash_agg equals the composed 64-vote-sum + pack bit-for-bit") {
    val votes = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"_b$b")
    }
    val packed = (0 until 64)
      .map(b => when(col(s"_b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    val composed = rows.groupBy("id").agg(votes.head, votes.tail: _*)
      .select(col("id"), packed.as("sh2"))
    val native = rows.groupBy("id").agg(SimHashAgg.simhashAggF(col("h")).as("sh"))
    assert(native.count() == composed.count())
    assert(native.join(composed, Seq("id"))
      .filter(col("sh") =!= col("sh2")).count() == 0L)
  }

  test("minhash_agg over an empty relation yields null (as the composed min columns do)") {
    val empty = Seq.empty[Long].toDF("h")
    val out = empty.agg(MinHashAgg.minhashAggF(col("h"), 4).as("sig")).collect()
    assert(out.length == 1 && out(0).isNullAt(0))
  }

  test("minhash_agg rejects non-bigint input") {
    val e = intercept[Exception] {
      Seq(("a", "x")).toDF("id", "h").groupBy("id")
        .agg(MinHashAgg.minhashAggF(col("h"), 4)).collect()
    }
    assert(e.getMessage.contains("bigint"))
  }
}
