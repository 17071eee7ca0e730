package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.asMediaTable(
    Seq((1L, "some text payload " * 12), (2L, "another, longer, text payload right here " * 8))
      .toDF("doc_id", "text"), "doc_id", "text", "image")

  test("asMediaTable produces the canonical (id, modality, payload) schema") {
    assert(media.schema == StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("payload", BinaryType))))
  }

  test("decodeStub: one row per media row, deterministic, real byte counts") {
    val a = Multimodal.decodeStub(media).collect().sortBy(_.id)
    val b = Multimodal.decodeStub(media).collect().sortBy(_.id)
    assert(a.toSeq == b.toSeq) // deterministic stub
    assert(a.map(_.id).toSeq == Seq(1L, 2L))
    assert(a(0).nBytes == ("some text payload " * 12).getBytes("UTF-8").length)
    assert(a.forall(m => m.width >= 16 && m.height >= 16 && m.nFrames >= 1))
  }

  test("sampleFrames: stride keeps every n-th frame with bounded slices") {
    val all = Multimodal.sampleFrames(media, stride = 1).collect()
    val sampled = Multimodal.sampleFrames(media, stride = 2).collect()
    assert(sampled.forall(_.frameIdx % 2 == 0))
    assert(sampled.length < all.length)
    assert(all.forall(_.frameBytes.length <= 32))
  }

  test("featureStub: fixed-dim float features, deterministic") {
    val out = Multimodal.featureStub(media, dim = 8)
    assert(out.schema("features").dataType.asInstanceOf[ArrayType].elementType == FloatType)
    val rows = out.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows(1L).length == 8)
    assert(rows(1L).forall(f => f >= -1.0f && f <= 1.0f))
    val again = Multimodal.featureStub(media, dim = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows == again)
  }
}
