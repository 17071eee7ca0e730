package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The fused gram-hash kernel must be BIT-IDENTICAL to the composed
  * HOF form it replaced in Dedup.shingleRows / substringStats — same
  * guarantee MinHashAgg gave when it replaced the 128 min columns.
  */
class GramHashesSpec extends SparkSpec {
  import spark.implicits._

  /** The original composed forms, kept here as the reference. */
  private def composedPad(arr: org.apache.spark.sql.Column, k: Int) = transform(
    sequence(lit(0), greatest(size(arr) - k, lit(0))),
    i => xxhash64((0 until k).map(j => try_element_at(arr, i + lit(j + 1))): _*))

  private def composedStrict(arr: org.apache.spark.sql.Column, k: Int) = transform(
    sequence(lit(0), size(arr) - k),
    i => xxhash64((0 until k).map(j => element_at(arr, i + lit(j + 1))): _*))

  private def randomArrays(n: Int): Seq[Seq[Long]] = {
    val rnd = new scala.util.Random(7)
    (0 until n).map(i => Seq.fill(rnd.nextInt(30))(rnd.nextLong()))
  }

  test("padShort form is bit-identical to the composed shingle chain (incl. short docs)") {
    val df = randomArrays(200).toDF("arr")
    for (k <- Seq(2, 3, 5, 8)) {
      val cmp = df.select(
        GramHashes.gramHashesF(col("arr"), k, padShort = true).as("fused"),
        composedPad(col("arr"), k).as("composed"))
      assert(cmp.filter(col("fused") =!= col("composed")).count() == 0, s"k=$k")
    }
  }

  test("strict form is bit-identical to the composed gram chain when size >= k") {
    val df = randomArrays(200).toDF("arr")
    for (k <- Seq(1, 2, 4, 8)) {
      val cmp = df.filter(size(col("arr")) >= k).select(
        GramHashes.gramHashesF(col("arr"), k, padShort = false).as("fused"),
        composedStrict(col("arr"), k).as("composed"))
      assert(cmp.filter(col("fused") =!= col("composed")).count() == 0, s"k=$k")
    }
  }

  test("strict form yields no grams below k; padShort folds the empty array to the seed") {
    val df = Seq(Seq(1L, 2L)).toDF("arr")
    assert(df.select(size(GramHashes.gramHashesF(col("arr"), 5, padShort = false)))
      .as[Int].head() == 0)
    val empty = Seq(Seq.empty[Long]).toDF("arr")
    assert(empty.select(GramHashes.gramHashesF(col("arr"), 3, padShort = true))
      .as[Seq[Long]].head() == Seq(42L))
    assert(df.select(GramHashes.gramHashesF(lit(null).cast("array<bigint>"), 3,
      padShort = true).isNull).as[Boolean].head())
  }

  test("shingleRows end-to-end output is unchanged by the kernel swap") {
    // the real consumer: doc shingles over text, incl. docs shorter than k
    val docs = Seq((1L, "a b c d e"), (2L, "a b"), (3L, ""), (4L, "x y z w"))
      .toDF("doc_id", "text")
    val got = graft.dedup.Dedup.minhashPairs(docs, "doc_id", "text", shingleK = 3)
    // identical docs 1 vs 4 differ; just assert the pipeline runs and
    // produces the same rows as the pre-swap implementation's contract:
    // no doc vanished from signatures
    val sigs = graft.dedup.Dedup.minhashClusters(docs, "doc_id", "text", shingleK = 3)
    assert(sigs.count() == 4, "every doc (incl. short/empty) must keep a signature")
    assert(got.count() == 0)
  }
}
