package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class TfExampleSpec extends SparkSpec {
  import TfExample._

  test("golden bytes: Example{a: int64_list [1]} matches the proto wire format exactly") {
    // hand-assembled from the public wire format:
    //   Int64List{value:[1]}              0A 01 01
    //   Feature{int64_list=3}             1A 03 <Int64List>
    //   map entry{key="a"=1, value=2}     0A 01 61 12 05 <Feature>
    //   Features{feature=1}               0A 0A <entry>
    //   Example{features=1}               0A 0C <Features>
    val expected = Array(
      0x0A, 0x0C, 0x0A, 0x0A, 0x0A, 0x01, 0x61, 0x12,
      0x05, 0x1A, 0x03, 0x0A, 0x01, 0x01).map(_.toByte)
    assert(encode(Map("a" -> Int64Feature(Seq(1L)))).toSeq == expected.toSeq)
  }

  test("fuzz: corrupt/truncated Example bytes fail cleanly, never crash") {
    val valid = encode(Map(
      "ids" -> Int64Feature(Seq(1L, 2L, 3L)),
      "w" -> FloatFeature(Seq(0.5f)),
      "t" -> BytesFeature(Seq("text".getBytes))))
    val rnd = new scala.util.Random(20260813L)
    def attempt(bytes: Array[Byte]): Unit =
      try { decode(bytes); () }
      catch {
        case _: java.io.IOException => ()
        case _: IllegalArgumentException => ()
      }
    (0 until 500).foreach { _ =>
      val garbage = new Array[Byte](rnd.nextInt(120)); rnd.nextBytes(garbage)
      attempt(garbage)
      val mutated = valid.clone()
      (0 to rnd.nextInt(4)).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      attempt(mutated)
      attempt(mutated.take(rnd.nextInt(mutated.length)))
    }
  }

  test("encode/decode roundtrip across all three feature kinds") {
    val ex = Map[String, TfFeature](
      "ids" -> Int64Feature(Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue)),
      "scores" -> FloatFeature(Seq(0f, -1.5f, 3.25f, Float.MaxValue)),
      "tags" -> BytesFeature(Seq("héllo".getBytes("UTF-8"), Array[Byte](), Array[Byte](0, 127, -128))),
      "empty_ints" -> Int64Feature(Nil))
    val back = decode(encode(ex))
    assert(back.keySet == ex.keySet)
    assert(back("ids") == ex("ids"))
    assert(back("scores") == ex("scores"))
    assert(back("empty_ints") == ex("empty_ints"))
    val (got, want) = (back("tags").asInstanceOf[BytesFeature].values,
      ex("tags").asInstanceOf[BytesFeature].values)
    assert(got.map(_.toSeq) == want.map(_.toSeq))
  }

  test("encoding is deterministic regardless of map insertion order") {
    val a = Map[String, TfFeature]("x" -> Int64Feature(Seq(1L)), "y" -> FloatFeature(Seq(2f)))
    val b = Map[String, TfFeature]("y" -> FloatFeature(Seq(2f)), "x" -> Int64Feature(Seq(1L)))
    assert(encode(a).toSeq == encode(b).toSeq)
  }

  test("decoder tolerates unpacked repeated encodings (proto3 compat)") {
    // Same Example as the golden test but int64 value UNPACKED:
    // Int64List{1: varint 1} encoded as tag 08 value 01
    val unpackedInt64List = Array(0x08, 0x01).map(_.toByte)
    val feature = Array(0x1A, 0x02).map(_.toByte) ++ unpackedInt64List
    val entry = Array(0x0A, 0x01, 0x61, 0x12, feature.length.toByte).map(_.toByte) ++ feature
    val features = Array(0x0A, entry.length.toByte).map(_.toByte) ++ entry
    val example = Array(0x0A, features.length.toByte).map(_.toByte) ++ features
    assert(decode(example) == Map("a" -> Int64Feature(Seq(1L))))
  }

  test("Spark write/read roundtrip through the TFRecord framing, nulls preserved") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", FloatType), StructField("emb", ArrayType(FloatType)),
      StructField("labels", ArrayType(LongType))))
    val rows = Seq(
      Row(1L, "alpha", 0.5f, Seq(1f, 2f), Seq(10L, 20L)),
      Row(2L, null, -2.25f, Seq(3f), Seq.empty[Long]),
      Row(3L, "gamma", null, null, Seq(7L)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = java.nio.file.Files.createTempDirectory("graft_tfexample").toFile
    dir.deleteOnExit()
    TfExample.write(df, dir.getAbsolutePath)
    val back = TfExample.read(spark, dir.getAbsolutePath, schema)
      .collect().sortBy(_.getAs[Long]("id"))
    assert(back.length == 3)
    assert(back(0).getAs[Long]("id") == 1L)
    assert(back(0).getAs[String]("name") == "alpha")
    assert(back(0).getAs[Float]("score") == 0.5f)
    assert(back(0).getSeq[Float](3).toList == List(1f, 2f))
    assert(back(0).getSeq[Long](4).toList == List(10L, 20L))
    assert(back(1).getAs[String]("name") == null)
    assert(back(1).getAs[Float]("score") == -2.25f)
    assert(back(1).getSeq[Long](4).toList == Nil) // empty list is a PRESENT feature
    // null cells are OMITTED from the Example, so they read back as null
    assert(back(2).getAs[Any]("score") == null)
    assert(back(2).getAs[Any]("emb") == null)
    assert(back(2).getSeq[Long](4).toList == List(7L))
  }

  test("schema subset and extra features: proto compatibility both ways") {
    val full = Map[String, TfFeature](
      "keep" -> Int64Feature(Seq(5L)), "extra" -> BytesFeature(Seq("x".getBytes)))
    val bytes = encode(full)
    // decode keeps everything; schema-driven read ignores extras and
    // nulls missing columns
    assert(decode(bytes).keySet == Set("keep", "extra"))
    val schema = StructType(Seq(
      StructField("keep", LongType), StructField("missing", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_tfexample2").toFile
    dir.deleteOnExit()
    import spark.implicits._
    TfRecord.write(Seq(bytes).toDF("value"), dir.getAbsolutePath)
    val row = TfExample.read(spark, dir.getAbsolutePath, schema).collect().head
    assert(row == Row(5L, null))
  }

  test("unsupported column types fail fast at write time") {
    val df = spark.range(1).selectExpr("named_struct('a', id) AS s")
    val e = intercept[IllegalArgumentException] {
      TfExample.write(df, "/tmp/never_written")
    }
    assert(e.getMessage.contains("unsupported Example column type"))
  }
}
