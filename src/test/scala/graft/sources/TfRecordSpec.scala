package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TfRecordSpec extends SparkSpec {
  import spark.implicits._

  private def scratch(leaf: String) = s"/tmp/graft_test/tfrecord/$leaf"

  test("TFRecord roundtrip preserves every record's bytes") {
    val path = scratch("roundtrip")
    val payloads = Seq("alpha", "", "βγδ unicode", "x" * 10000)
    val in = payloads.map(_.getBytes("UTF-8")).toDF("value")
    val shards = TfRecord.write(in, path)
    assert(shards >= 1)
    val back = TfRecord.read(spark, path)
      .select(decode(col("value"), "UTF-8").as("s")).as[String].collect().sorted
    assert(back.toSeq == payloads.sorted)
  }

  test("TFRecord roundtrip on 300 random binary payloads (all byte values, sizes 0-4KB)") {
    val path = scratch("fuzz")
    val rng = new scala.util.Random(7L)
    val payloads = (1 to 300).map { i =>
      val b = new Array[Byte](rng.nextInt(4096))
      rng.nextBytes(b)
      (i.toLong, b)
    }
    TfRecord.write(payloads.toDF("id", "value").repartition(4), path)
    val back = TfRecord.read(spark, path).select(md5(col("value"))).as[String]
      .collect().sorted
    val expected = payloads.map(p =>
      java.security.MessageDigest.getInstance("MD5").digest(p._2)
        .map("%02x".format(_)).mkString).sorted
    assert(back.toSeq == expected)
  }

  test("TFRecord framing is 16 overhead bytes per record (spec layout)") {
    val path = scratch("framing")
    val payloads = Seq(Array[Byte](1, 2, 3), Array[Byte]())
    TfRecord.write(payloads.toDF("value").repartition(1), path)
    val files = Files.list(Paths.get(path)).toArray.map(_.toString).filter(_.endsWith(".tfrecord"))
    assert(files.length == 1)
    val bytes = Files.readAllBytes(Paths.get(files.head))
    assert(bytes.length == payloads.map(_.length + 16).sum)
    // u64 little-endian length of the first record
    assert(bytes(0) == 3.toByte && bytes.slice(1, 8).forall(_ == 0))
  }

  test("write shards one file per partition; read keeps path provenance") {
    val path = scratch("shards")
    val in = (1 to 90).map(i => s"doc$i".getBytes("UTF-8")).toDF("value")
    val shards = TfRecord.write(in.repartition(3), path)
    assert(shards == 3)
    val back = TfRecord.read(spark, path)
    assert(back.count() == 90)
    assert(back.select("path").distinct().count() == 3)
  }

  test("corrupt payload bytes fail the CRC check loudly") {
    val path = scratch("corrupt")
    TfRecord.write(Seq("payload-to-corrupt".getBytes("UTF-8")).toDF("value"), path)
    val file = Files.list(Paths.get(path)).toArray.map(_.toString)
      .filter(_.endsWith(".tfrecord")).head
    val bytes = Files.readAllBytes(Paths.get(file))
    bytes(14) = (bytes(14) ^ 0xFF).toByte // inside the payload region
    Files.write(Paths.get(file), bytes)
    val e = intercept[Exception](TfRecord.read(spark, path).count())
    assert(e.getMessage.contains("CRC") || e.getCause != null)
  }

  test("truncated file fails instead of silently shortening the dataset") {
    val path = scratch("truncated")
    TfRecord.write(Seq("0123456789".getBytes("UTF-8")).toDF("value"), path)
    val file = Files.list(Paths.get(path)).toArray.map(_.toString)
      .filter(_.endsWith(".tfrecord")).head
    val bytes = Files.readAllBytes(Paths.get(file))
    Files.write(Paths.get(file), bytes.dropRight(3))
    val e = intercept[Exception](TfRecord.read(spark, path).count())
    assert(e.getMessage.contains("truncated") || e.getCause != null)
  }
}
