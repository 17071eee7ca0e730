package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class ProtobufSpec extends SparkSpec {

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_proto").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def hex(bytes: Array[Byte]): String = bytes.map("%02x".format(_)).mkString

  test("encodeRow produces protoc's exact wire bytes (golden)") {
    // message M { int64 id = 1; string name = 2; double score = 3;
    //             repeated int64 xs = 4; }  — wire bytes computed by
    // hand from the proto3 spec: field 1 varint 150, field 2
    // len-delimited "test", field 3 fixed64 1.5, field 4 packed [1,2,3]
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("xs", ArrayType(LongType))))
    val bytes = Protobuf.encodeRow(schema, Row(150L, "test", 1.5, Seq(1L, 2L, 3L)))
    assert(hex(bytes) == "089601" + "120474657374" + "19000000000000f83f" + "2203010203")
  }

  test("decode tolerates unknown fields, unpacked repeated, and any field order") {
    // stock-encoder pattern: field order reversed vs schema, an unknown
    // field 9 (varint), and xs sent UNPACKED (three wire-0 fields) —
    // all legal proto3 that a protoc-generated parser would also accept
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("xs", ArrayType(LongType))))
    // positional field numbers: id=1, xs=2
    val out = new java.io.ByteArrayOutputStream()
    def b(xs: Int*): Unit = xs.foreach(out.write)
    b(0x48, 0x2A)             // unknown field 9, varint 42
    b(0x10, 0x05)             // xs unpacked: field 2 wire 0, value 5
    b(0x08, 0x96, 0x01)       // id = 150 (after xs — out of order)
    b(0x10, 0x07)             // xs unpacked again, value 7
    val row = Protobuf.decodeRow(schema, out.toByteArray)
    assert(row.getLong(0) == 150L)
    assert(row.getSeq[Long](1) == Seq(5L, 7L))
  }

  test("map fields produce protoc's exact wire bytes (golden)") {
    // message M { map<string,int64> m = 1; }  m = {"a":1, "bb":300} —
    // protoc encodes one entry message per pair: key=1, value=2.
    // entry("a",1)   = 0a 01 61 | 10 01          → field: 0a 05 …
    // entry("bb",300)= 0a 02 62 62 | 10 ac 02    → field: 0a 07 …
    val schema = StructType(Seq(StructField("m", MapType(StringType, LongType))))
    // LinkedHashMap-backed literal keeps insertion order deterministic
    val bytes = Protobuf.encodeRow(schema,
      Row(scala.collection.immutable.ListMap("a" -> 1L, "bb" -> 300L)))
    assert(hex(bytes) == "0a050a0161" + "1001" + "0a070a026262" + "10ac02")
  }

  test("enum fields encode as varints against the declared symbol table (golden)") {
    // message E { Color c = 1; repeated Color cs = 2; } with
    // Color { RED=0; GREEN=1; BLUE=2; }  c=GREEN, cs=[RED,BLUE] packed
    val colors = Protobuf.enumMetadata(Seq("RED", "GREEN", "BLUE"))
    val schema = StructType(Seq(
      StructField("c", StringType, nullable = true, colors),
      StructField("cs", ArrayType(StringType), nullable = true, colors)))
    val bytes = Protobuf.encodeRow(schema, Row("GREEN", Seq("RED", "BLUE")))
    assert(hex(bytes) == "0801" + "12020002")
    // roundtrip restores the symbols
    val back = Protobuf.decodeRow(schema, bytes)
    assert(back.getString(0) == "GREEN")
    assert(back.getSeq[String](1) == Seq("RED", "BLUE"))
    // an undeclared symbol fails fast at encode
    val e = intercept[IllegalArgumentException](
      Protobuf.encodeRow(schema, Row("MAUVE", null)))
    assert(e.getMessage.contains("MAUVE"))
    // an unknown enum NUMBER decodes to null (UNRECOGNIZED), parse intact
    val out = new java.io.ByteArrayOutputStream()
    Seq(0x08, 0x63, 0x12, 0x01, 0x01).foreach(out.write) // c=99, cs=[GREEN]
    val unk = Protobuf.decodeRow(schema, out.toByteArray)
    assert(unk.isNullAt(0))
    assert(unk.getSeq[String](1) == Seq("GREEN"))
  }

  test("sint/fixed wire formats encode protoc's exact bytes and roundtrip (golden)") {
    // message S { sint64 a=1; sint32 b=2; fixed64 c=3; sfixed32 d=4;
    //             repeated sint64 xs=5; repeated fixed32 fs=6; }
    val zz = Protobuf.formatMetadata("zigzag")
    val fx = Protobuf.formatMetadata("fixed")
    val schema = StructType(Seq(
      StructField("a", LongType, nullable = true, zz),
      StructField("b", IntegerType, nullable = true, zz),
      StructField("c", LongType, nullable = true, fx),
      StructField("d", IntegerType, nullable = true, fx),
      StructField("xs", ArrayType(LongType), nullable = true, zz),
      StructField("fs", ArrayType(IntegerType), nullable = true, fx)))
    val row = Row(-1L, -2, 1L, -1, Seq(-1L, 1L), Seq(1, 2))
    val bytes = Protobuf.encodeRow(schema, row)
    assert(hex(bytes) ==
      "0801" +                      // a: zigzag64(-1) = 1
      "1003" +                      // b: zigzag32(-2) = 3
      "190100000000000000" +        // c: fixed64 LE 1
      "25ffffffff" +                // d: sfixed32 LE -1
      "2a020102" +                  // xs packed: zz(-1)=1, zz(1)=2
      "32080100000002000000")       // fs packed: fixed32 LE 1, 2
    val back = Protobuf.decodeRow(schema, bytes)
    assert(back == row)
    // extreme values roundtrip (sign bit through zigzag, full 64-bit fixed)
    val ext = Row(Long.MinValue, Int.MinValue, -1L, Int.MaxValue,
      Seq(Long.MaxValue, 0L), Seq(Int.MinValue))
    assert(Protobuf.decodeRow(schema, Protobuf.encodeRow(schema, ext)) == ext)
    // UNPACKED repeated sint from a stock encoder still parses
    val out = new java.io.ByteArrayOutputStream()
    Seq(0x28, 0x01, 0x28, 0x04).foreach(out.write) // xs: zz 1 → -1, zz 4 → 2
    val unp = Protobuf.decodeRow(schema, out.toByteArray)
    assert(unp.getSeq[Long](4) == Seq(-1L, 2L))
    // a non-integral column rejects the declaration at encode
    val bad = StructType(Seq(StructField("s", StringType, nullable = true, zz)))
    val e = intercept[IllegalArgumentException](Protobuf.encodeRow(bad, Row("x")))
    assert(e.getMessage.contains("integral"))
  }

  test("map roundtrip: typed values, duplicate keys last-win, absent fields default") {
    val schema = StructType(Seq(
      StructField("ss", MapType(StringType, StringType)),
      StructField("li", MapType(LongType, StructType(Seq(StructField("x", LongType)))))))
    val row = Row(Map("k" -> "v", "" -> ""),
      Map(1L -> Row(10L), -2L -> Row(-20L)))
    val back = Protobuf.decodeRow(schema, Protobuf.encodeRow(schema, row))
    assert(back.getMap[String, String](0) == Map("k" -> "v", "" -> ""))
    val li = back.getMap[Long, Row](1)
    assert(li(1L).getLong(0) == 10L && li(-2L).getLong(0) == -20L)
    // duplicate keys: protoc's merge rule is last-wins
    val dup = new java.io.ByteArrayOutputStream()
    def b(xs: Int*): Unit = xs.foreach(dup.write)
    b(0x0a, 0x06, 0x0a, 0x01, 0x61, 0x12, 0x01, 0x78) // {"a":"x"}
    b(0x0a, 0x06, 0x0a, 0x01, 0x61, 0x12, 0x01, 0x79) // {"a":"y"} — wins
    // a fully-default entry ({"":""}): stock encoders send an EMPTY message
    b(0x0a, 0x00)
    val merged = Protobuf.decodeRow(
      StructType(Seq(StructField("ss", MapType(StringType, StringType)))), dup.toByteArray)
    assert(merged.getMap[String, String](0) == Map("a" -> "y", "" -> ""))
  }

  test("a wire-type mismatch on a message-typed field skips, not corrupts") {
    // field 1 declared as a nested message but arriving as wire-0
    // varint (schema drift): the varint must be SKIPPED — reading its
    // payload as a length would desynchronize the rest of the parse
    val schema = StructType(Seq(
      StructField("inner", StructType(Seq(StructField("a", LongType)))),
      StructField("id", LongType)))
    val out = new java.io.ByteArrayOutputStream()
    def b(xs: Int*): Unit = xs.foreach(out.write)
    b(0x08, 0x96, 0x01)  // field 1 wire 0 varint 150 — mismatched
    b(0x10, 0x07)        // field 2 (id) = 7 must still parse
    val row = Protobuf.decodeRow(schema, out.toByteArray)
    assert(row.isNullAt(0))
    assert(row.getLong(1) == 7L)
  }

  private val fullSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("ratio", FloatType),
    StructField("flag", BooleanType),
    StructField("blob", BinaryType),
    StructField("xs", ArrayType(LongType)),
    StructField("fs", ArrayType(FloatType)),
    StructField("tags", ArrayType(StringType)),
    StructField("inner", StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType))))))

  private def fullFixture = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row(1L, "alpha", 1.5, 0.25f, true, Array[Byte](1, 2),
        Seq(-1L, 0L, Long.MaxValue), Seq(0.5f, -1f), Seq("a", "b"), Row(7, "in")),
      Row(2L, null, null, null, false, null, null, null, null, null),
      Row(-3L, "gámma", -0.25, -1e9f, null, Array.emptyByteArray,
        Seq.empty[Long], Seq.empty[Float], Seq.empty[String], Row(null, null))
    ), 2), fullSchema)

  test("row roundtrip preserves every supported type, nulls, negatives, nesting") {
    fullFixture.collect().foreach { r =>
      val back = Protobuf.decodeRow(fullSchema, Protobuf.encodeRow(fullSchema, r))
      assert(back.getLong(0) == r.getLong(0))
      assert(Option(back.getString(1)) == Option(r.getString(1)))
      assert(back.isNullAt(2) == r.isNullAt(2))
      if (!r.isNullAt(2)) assert(back.getDouble(2) == r.getDouble(2))
      if (!r.isNullAt(6) && r.getSeq[Long](6).nonEmpty)
        assert(back.getSeq[Long](6) == r.getSeq[Long](6)) // incl. Long.MaxValue + negatives
      if (!r.isNullAt(9) && !r.getStruct(9).isNullAt(0))
        assert(back.getStruct(9).getInt(0) == r.getStruct(9).getInt(0))
    }
  }

  test("empty numeric arrays and absent fields both decode as null (proto3 absence)") {
    // packed empty array writes nothing on the wire — indistinguishable
    // from absence, same as protoc
    val r = Protobuf.decodeRow(fullSchema,
      Protobuf.encodeRow(fullSchema, fullFixture.collect().sortBy(_.getLong(0)).head))
    val r3 = Protobuf.decodeRow(fullSchema, Protobuf.encodeRow(fullSchema,
      Row(-3L, "gámma", -0.25, -1e9f, null, Array.emptyByteArray,
        Seq.empty[Long], Seq.empty[Float], Seq.empty[String], Row(null, null))))
    assert(r3.isNullAt(6) && r3.isNullAt(7) && r3.isNullAt(8))
  }

  test("repeated message fields (Array[Struct]) roundtrip, interleaved with others") {
    val inner = StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType)))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("msgs", ArrayType(inner)),
      StructField("tag", StringType)))
    val row = Row(7L, Seq(Row(1, "x"), Row(null, "y"), Row(3, null)), "t")
    val back = Protobuf.decodeRow(schema, Protobuf.encodeRow(schema, row))
    assert(back.getLong(0) == 7L && back.getString(2) == "t")
    val msgs = back.getSeq[Row](1)
    assert(msgs.size == 3)
    assert(msgs(0) == Row(1, "x") && msgs(1) == Row(null, "y") && msgs(2) == Row(3, null))
    // empty repeated-message list writes nothing → absent → null
    val empty = Protobuf.decodeRow(schema,
      Protobuf.encodeRow(schema, Row(1L, Seq.empty[Row], "u")))
    assert(empty.isNullAt(1))
  }

  test("explicit protoField metadata overrides positional field numbers") {
    val meta = new MetadataBuilder().putLong("protoField", 12).build()
    val s = StructType(Seq(StructField("id", LongType, nullable = false, meta)))
    val bytes = Protobuf.encodeRow(s, Row(1L))
    assert(hex(bytes) == "6001") // tag = (12 << 3) | 0 = 0x60
    assert(Protobuf.decodeRow(s, bytes).getLong(0) == 1L)
  }

  test("avro-container write/read roundtrip; files open with stock Avro tooling") {
    val dir = tmpDir()
    val shards = Protobuf.write(fullFixture, dir)
    assert(shards >= 1)
    val back = Protobuf.read(spark, dir, fullSchema).collect().sortBy(_.getLong(0))
    assert(back.length == 3)
    assert(back(1).getString(1) == "alpha" && back(1).getSeq[String](8) == Seq("a", "b"))
    assert(back(0).getLong(0) == -3L && back(2).isNullAt(1))
    // scio layout: Avro records with one bytes field, stock reader opens it
    val part = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro")).head
    val reader = new org.apache.avro.file.DataFileReader(
      part, new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    try {
      assert(reader.getSchema.getField("bytes") != null)
      assert(reader.iterator().hasNext)
    } finally reader.close()
  }

  test("tfrecord-container write/read roundtrip") {
    val dir = tmpDir()
    Protobuf.write(fullFixture, dir, container = "tfrecord")
    val back = Protobuf.read(spark, dir, fullSchema, container = "tfrecord")
      .collect().sortBy(_.getLong(0))
    assert(back.length == 3 && back(1).getDouble(2) == 1.5)
  }

  test("fuzz: corrupt/truncated messages fail with clean truncation errors") {
    // foreign wire bytes must never escape decode with an index error
    // or silently read across a nested message boundary — acceptable
    // outcomes are a decoded Row or IOException/IllegalArgumentException
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("xs", ArrayType(LongType)),
      StructField("nested", StructType(Seq(
        StructField("a", LongType), StructField("b", StringType)))),
      StructField("m", MapType(StringType, LongType))))
    val valid = Protobuf.encodeRow(schema,
      Row(150L, "test", 1.5, Seq(1L, 2L, 3L), Row(7L, "x"), Map("k" -> 9L)))
    val rnd = new scala.util.Random(20260813L)
    def attempt(bytes: Array[Byte]): Unit =
      try { Protobuf.decodeRow(schema, bytes); () }
      catch {
        case _: java.io.IOException => ()
        case _: IllegalArgumentException => ()
      }
    (0 until 500).foreach { _ =>
      val garbage = new Array[Byte](rnd.nextInt(200)); rnd.nextBytes(garbage)
      attempt(garbage)
      val mutated = valid.clone()
      (0 to rnd.nextInt(4)).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      attempt(mutated)
      attempt(mutated.take(rnd.nextInt(mutated.length)))
    }
  }

  test("nested varint cannot read past its message boundary") {
    // field 5 (nested message, wire 2) claiming length 1 whose single
    // byte has the varint continuation bit set: the inner read must
    // stop at the slice end, not continue into the next field's bytes
    val schema = StructType(Seq(
      StructField("nested", StructType(Seq(StructField("a", LongType)))),
      StructField("id", LongType)))
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x0A, 0x01, 0x08)) // field 1 wire 2 len 1: tag only
    out.write(Array[Byte](0x10, 0x05))       // field 2 varint 5
    val e = intercept[java.io.IOException](Protobuf.decodeRow(schema, out.toByteArray))
    assert(e.getMessage.contains("truncated proto"))
  }

  test("unsupported column types fail fast driver-side") {
    val df = spark.range(1).selectExpr("cast(id AS decimal(10,2)) AS d")
    val e = intercept[IllegalArgumentException](Protobuf.write(df, "/tmp/never"))
    assert(e.getMessage.contains("unsupported proto column type"))
    // proto map keys must be string/integral/bool
    val dk = spark.range(1).selectExpr("map(cast(id AS double), 'x') AS m")
    val e2 = intercept[IllegalArgumentException](Protobuf.write(dk, "/tmp/never"))
    assert(e2.getMessage.contains("map key"))
  }
}
