package graft.pipeline

import graft.SparkSpec
import org.apache.spark.ml.classification.LogisticRegressionModel
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies → linearly separable
  private val goodVocab = Array("theorem", "proof", "lemma", "analysis", "algebra",
    "integral", "matrix", "vector", "topology", "measure")
  private val junkVocab = Array("click", "winner", "free", "prize", "casino",
    "deal", "offer", "buy", "cheap", "now")
  private def mkDocs(vocab: Array[String], ids: Range, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    ids.map { i =>
      (i.toLong, Seq.fill(30)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("separable corpora: held-out accuracy above 0.95, probabilities ordered") {
    val model = QualityClassifier.train(
      mkDocs(goodVocab, 0 until 80, 1), mkDocs(junkVocab, 1000 until 1080, 2),
      "doc_id", "text", numBuckets = 512, maxIter = 30)
    val heldGood = QualityClassifier.score(
      mkDocs(goodVocab, 200 until 240, 3), model, "doc_id", "text", 512)
      .select("quality").as[Double].collect()
    val heldJunk = QualityClassifier.score(
      mkDocs(junkVocab, 2000 until 2040, 4), model, "doc_id", "text", 512)
      .select("quality").as[Double].collect()
    val acc = (heldGood.count(_ > 0.5) + heldJunk.count(_ < 0.5)).toDouble /
      (heldGood.length + heldJunk.length)
    assert(acc > 0.95, s"held-out accuracy $acc")
    assert(heldGood.min > heldJunk.max,
      "separable vocabularies must score disjointly")
  }

  test("featurize rejects non-integral id columns loudly") {
    val stringIds = Seq(("a", "some text")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      QualityClassifier.featurize(stringIds, "doc_id", "text", 64))
    assert(e.getMessage.contains("integral"))
  }

  test("featurize: L1-normalized vectors, empty docs keep a zero-vector row") {
    val df = Seq((1L, "a b a"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val f = QualityClassifier.featurize(df, "doc_id", "text", 64)
      .collect().map(r => r.getLong(0) ->
        r.getAs[org.apache.spark.ml.linalg.Vector](1)).toMap
    assert(f.keySet == Set(1L, 2L, 3L))
    assert(math.abs(f(1L).toArray.sum - 1.0) < 1e-12, "L1 normalization")
    assert(f(2L).numNonzeros == 0 && f(3L).numNonzeros == 0)
  }

  test("scoreWithWeights: a sparse weights artifact keeps the TRUE token total as denominator") {
    // the advisor-flagged trap: with an INNER weights join, the L1
    // denominator sum(cnt) silently shrank to the COVERED buckets'
    // token count whenever the artifact didn't span every bucket —
    // and the oracle shared the shape, so the gate couldn't see it.
    // A dense artifact (zero weights materialized) and its sparse trim
    // (zero rows dropped) are the same model and must score the same.
    val base = java.nio.file.Files.createTempDirectory("graft_qc_sparse").toString
    try {
      val docs = Seq((1L, "alpha beta alpha"), (2L, "")).toDF("doc_id", "text")
      val feats = Dsir.featureRows(docs, "doc_id", "text", 64)
        .collect().map(r => (r.getLong(1), r.getLong(2))) // (bucket, cnt)
      val total = feats.map(_._2).sum.toDouble
      val (b0, c0) = feats.head
      val intercept = 0.25
      val denseRows = (0L until 64L).map(b => (b, if (b == b0) 1.0 else 0.0)) :+
        (-1L, intercept)
      val sparseRows = Seq((b0, 1.0), (-1L, intercept))
      denseRows.toDF("bucket", "weight").write.parquet(s"$base/dense")
      sparseRows.toDF("bucket", "weight").write.parquet(s"$base/sparse")
      def scores(path: String): Map[Long, Double] =
        QualityClassifier.scoreWithWeights(docs, "doc_id", "text", 64, path)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val dense = scores(s"$base/dense")
      val sparse = scores(s"$base/sparse")
      assert(dense == sparse, "zero-trimming the artifact must not change scores")
      val expected = 1.0 / (1.0 + math.exp(-(intercept + c0 / total)))
      assert(math.abs(dense(1L) - expected) < 1e-12,
        s"denominator must be the full token total: got ${dense(1L)}, want $expected")
      // the no-token doc keeps the zero-vector score
      assert(math.abs(dense(2L) - 1.0 / (1.0 + math.exp(-intercept))) < 1e-12)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("model save/load roundtrip scores identically") {
    val base = java.nio.file.Files.createTempDirectory("graft_qc").toString
    try {
      val model = QualityClassifier.train(
        mkDocs(goodVocab, 0 until 40, 5), mkDocs(junkVocab, 100 until 140, 6),
        "doc_id", "text", numBuckets = 256, maxIter = 20)
      model.write.overwrite().save(s"$base/m")
      val back = LogisticRegressionModel.load(s"$base/m")
      val probe = mkDocs(goodVocab ++ junkVocab, 500 until 520, 7)
      val a = QualityClassifier.score(probe, model, "doc_id", "text", 256)
        .orderBy("id").collect().map(_.getDouble(1)).toSeq
      val b = QualityClassifier.score(probe, back, "doc_id", "text", 256)
        .orderBy("id").collect().map(_.getDouble(1)).toSeq
      assert(a == b)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }
}
