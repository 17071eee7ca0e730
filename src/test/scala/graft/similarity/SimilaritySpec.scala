package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecDf(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("bruteForceTopK returns exact cosine order, excludes self") {
    // hand-checkable 2-d vectors: cos(v1, [1,0]) ranks by angle
    val corpus = vecDf(
      1L -> Seq(1f, 0f), 2L -> Seq(1f, 1f), 3L -> Seq(0f, 1f), 4L -> Seq(-1f, 0f))
    val probes = vecDf(1L -> Seq(1f, 0f))
    val out = KNN.bruteForceTopK(corpus, probes, "vec_id", "embedding", k = 3)
      .orderBy(col("rank")).collect()
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(2L, 3L, 4L)) // by descending cosine
    assert(out.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
    assert(math.abs(out(0).getAs[Double]("cos_sim") - math.sqrt(0.5)) < 1e-9)
    assert(out.forall(_.getAs[Long]("id") != 1L))
  }

  test("ivfTopK: candidate scores are exact (vs brute force on real embeddings)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val probes = emb.filter(col("vec_id") <= 10)
    val ivf = KNN.ivfTopK(emb, probes, "vec_id", "embedding", k = 5, dim = 64, cellBits = 4)
    val bruteScores = KNN.bruteForceTopK(emb, probes, "vec_id", "embedding", 1000000)
      .select(col("probe_id"), col("id"), col("cos_sim").as("brute_sim"))
    val maxDiff = ivf.join(bruteScores, Seq("probe_id", "id"))
      .select(abs(col("cos_sim") - col("brute_sim")).as("d")).agg(max("d")).as[Double].head()
    assert(maxDiff < 1e-9)
  }

  test("ivfTopK: high recall where near neighbors actually exist (clustered data)") {
    // LSH cells only help when the corpus has genuine neighborhoods —
    // on near-random vectors no partitioning beats chance, so recall
    // is asserted on seeded clustered data (10 tight clusters).
    val dim = 16
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(10, dim)(rnd.nextGaussian())
    val rows = for {
      c <- centers.indices
      i <- 0 until 30
    } yield {
      val v = centers(c).map(x => (x + rnd.nextGaussian() * 0.05).toFloat).toSeq
      ((c * 30 + i).toLong, v)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") % 30 === 0) // one probe per cluster
    val k = 5
    def neighborSets(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("probe_id").agg(collect_set(col("id")).as("ids"))
        .collect().map(r => r.getAs[Long]("probe_id") -> r.getSeq[Long](1).toSet).toMap
    val brute = neighborSets(KNN.bruteForceTopK(corpus, probes, "vec_id", "embedding", k))
    val ivf = neighborSets(KNN.ivfTopK(corpus, probes, "vec_id", "embedding", k, dim, cellBits = 4))
    val recall = brute.keys.toSeq.map(p => (ivf.getOrElse(p, Set()) & brute(p)).size.toDouble / k)
      .sum / brute.size
    assert(recall >= 0.8, s"recall@$k was $recall")
  }

  test("nearDupByEmbedding flags an exact duplicate vector") {
    val corpus = vecDf(1L -> Seq(1f, 2f, 3f), 2L -> Seq(1f, 2f, 3f), 3L -> Seq(-3f, 1f, 0f))
    val out = KNN.nearDupByEmbedding(corpus, corpus.filter(col("vec_id") === 1), "vec_id", "embedding", 0.95)
      .collect().head
    assert(out.getAs[Long]("nn_id") == 2L)
    assert(out.getAs[Boolean]("is_dup"))
    assert(math.abs(out.getAs[Double]("cos_sim") - 1.0) < 1e-9)
  }
}
