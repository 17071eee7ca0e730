package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("featureRows counts unigrams + bigrams; empty docs yield no rows") {
    val df = Seq((1L, "a b c"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val feats = Dsir.featureRows(df, "doc_id", "text", numBuckets = 64)
    // "a b c" → unigrams a,b,c + bigrams "a b","b c" = 5 features
    assert(feats.agg(sum("cnt")).collect()(0).getLong(0) == 5L)
    assert(feats.select("id").distinct().as[Long].collect().toSeq == Seq(1L))
  }

  test("bucketLogProbs is a proper smoothed distribution over all buckets") {
    val feats = Dsir.featureRows(
      Seq((1L, "x y z x")).toDF("doc_id", "text"), "doc_id", "text", 32)
    val lps = Dsir.bucketLogProbs(feats, 32).select("lp").as[Double].collect()
    assert(lps.length == 32)
    assert(math.abs(lps.map(math.exp).sum - 1.0) < 1e-9)
  }

  test("logWeights ranks target-like docs above off-target docs") {
    val target = (1 to 20).map(i => (1000L + i, "alpha beta gamma alpha beta"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta gamma alpha beta gamma"),
      (2L, "zebra yankee xylophone walrus votary"),
      (3L, "")).toDF("doc_id", "text")
    val w = Dsir.logWeights(raw, target, "doc_id", "text", numBuckets = 256)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(w(1L)._2 > w(2L)._2, "target-vocabulary doc must out-weigh alien vocabulary")
    assert(w(1L)._2 > 0.0 && w(2L)._2 < 0.0)
    assert(w(3L) == ((0L, 0.0)), "empty doc keeps a zero-weight row, not dropped")
  }

  test("logWeights is stable under repartitioning") {
    val docs = (1 to 200).map(i => (i.toLong, s"tok${i % 17} tok${i % 5} tok${i % 3}"))
      .toDF("doc_id", "text")
    val t = docs.filter(col("doc_id") % 4 === 0)
    val a = sortedRows(Dsir.logWeights(docs, t, "doc_id", "text", 128))
    val b = sortedRows(Dsir.logWeights(docs.repartition(11), t.repartition(3),
      "doc_id", "text", 128))
    assert(a == b)
  }

  test("logWeightsWithin equals logWeights on the same labeled subset") {
    val docs = (1 to 150).map(i =>
      (i.toLong, s"tok${i % 13} tok${i % 7} tok${i % 3}", if (i % 4 == 0) "en" else "xx"))
      .toDF("doc_id", "text", "lang")
    val a = sortedRows(Dsir.logWeights(docs,
      docs.filter(col("lang") === "en"), "doc_id", "text", 128))
    val b = sortedRows(Dsir.logWeightsWithin(docs,
      col("lang") === "en", "doc_id", "text", 128))
    assert(a == b)
  }

  test("resampleTopK: reproducible seeded draw, k bounds, high weights favored") {
    val w = ((1 to 50).map(i => (i.toLong, 10L, 5.0)) ++
      (51 to 100).map(i => (i.toLong, 10L, -5.0)))
      .toDF("id", "n_feats", "logw")
    val draw1 = Dsir.resampleTopK(w, 20, "s1").select("id").as[Long].collect().toSet
    val draw2 = Dsir.resampleTopK(w, 20, "s1").select("id").as[Long].collect().toSet
    assert(draw1 == draw2, "same seed → same draw")
    assert(draw1.size == 20)
    // a 10-nat gap dwarfs Gumbel noise: the draw stays in the heavy half
    assert(draw1.forall(_ <= 50L))
    val draw3 = Dsir.resampleTopK(w, 20, "s2").select("id").as[Long].collect().toSet
    assert(draw3.forall(_ <= 50L))
    assert(draw1 != draw3, "different seed → different draw (within the heavy half)")
  }
}
