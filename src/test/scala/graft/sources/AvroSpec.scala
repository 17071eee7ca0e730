package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class AvroSpec extends SparkSpec {

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_avro").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("flag", BooleanType),
    StructField("blob", BinaryType),
    StructField("emb", ArrayType(FloatType)),
    StructField("tags", ArrayType(StringType))))

  private def fixture = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row(1L, "alpha", 1.5, true, Array[Byte](1, 2), Seq(0.5f, -1f), Seq("a", "b")),
      Row(2L, null, null, false, null, Seq.empty[Float], Seq.empty[String]),
      Row(3L, "gámma", -0.25, null, Array.emptyByteArray, null, null)
    ), 2), schema)

  test("write/read roundtrip preserves every supported type including nulls") {
    val dir = tmpDir()
    val shards = Avro.write(fixture, dir)
    assert(shards >= 1)
    assert(new java.io.File(s"$dir/_SUCCESS").exists())
    val back = Avro.read(spark, dir, schema).collect().sortBy(_.getLong(0))
    assert(back.length == 3)
    assert(back(0).getString(1) == "alpha" && back(0).getDouble(2) == 1.5 && back(0).getBoolean(3))
    assert(back(0).getAs[Array[Byte]](4).toSeq == Seq[Byte](1, 2))
    assert(back(0).getSeq[Float](5).toList == List(0.5f, -1f))
    assert(back(0).getSeq[String](6).toList == List("a", "b"))
    assert(back(1).isNullAt(1) && back(1).isNullAt(2) && !back(1).getBoolean(3))
    assert(back(1).getSeq[Float](5).isEmpty) // empty array is present, not null
    assert(back(2).getString(1) == "gámma")  // non-ascii through Utf8
    assert(back(2).isNullAt(5) && back(2).isNullAt(6))
  }

  test("files are genuine Avro container files readable by the stock library") {
    val dir = tmpDir()
    Avro.write(fixture, dir)
    val part = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro")).head
    // stock Avro reader, zero graft involvement
    val reader = new org.apache.avro.file.DataFileReader(
      part, new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    try {
      assert(reader.getSchema.getType == org.apache.avro.Schema.Type.RECORD)
      assert(reader.getSchema.getField("name").schema().getType == org.apache.avro.Schema.Type.UNION)
      assert(reader.iterator().hasNext)
    } finally reader.close()
  }

  test("schema evolution: missing fields read as null, extra container fields ignored") {
    val dir = tmpDir()
    Avro.write(fixture, dir)
    val narrow = StructType(Seq(
      StructField("name", StringType), StructField("not_there", IntegerType)))
    val back = Avro.read(spark, dir, narrow).collect()
    assert(back.length == 3)
    assert(back.forall(_.isNullAt(1)))
    assert(back.map(r => Option(r.getString(0))).toSet == Set(Some("alpha"), None, Some("gámma")))
  }

  test("a single multi-block container file splits across many read tasks") {
    val dir = tmpDir()
    val wide = spark.range(5000).selectExpr(
      "id", "repeat('x', 64) AS pad", "cast(id * 1.5 as double) AS score")
      .repartition(1) // ONE container file — parallelism must come from splitting
    val shards = Avro.write(wide, dir, syncIntervalBytes = 1024)
    assert(shards == 1)
    val readSchema = StructType(Seq(
      StructField("id", LongType), StructField("pad", StringType),
      StructField("score", DoubleType)))
    val back = Avro.read(spark, dir, readSchema, splitBytes = 16 << 10)
    assert(back.rdd.getNumPartitions > 1,
      s"expected >1 split task, got ${back.rdd.getNumPartitions}")
    assert(back.count() == 5000) // every record exactly once across splits
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
      == 5000L * 4999 / 2)
  }

  test("stock-written SNAPPY container (foreign producer) splits and reads back") {
    // a file graft did not write: stock Avro writer, snappy codec,
    // small blocks — the external-producer case the splittable read
    // exists for. Codec rides in the container header.
    val dir = tmpDir()
    val avroSchema = org.apache.avro.SchemaBuilder.record("ext").fields()
      .requiredLong("id").requiredString("pad").endRecord()
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](avroSchema))
    w.setCodec(org.apache.avro.file.CodecFactory.snappyCodec())
    w.setSyncInterval(1024)
    w.create(avroSchema, new java.io.File(dir, "part-00000.avro"))
    (0 until 4000).foreach { i =>
      val rec = new org.apache.avro.generic.GenericData.Record(avroSchema)
      rec.put("id", i.toLong); rec.put("pad", "x" * 40)
      w.append(rec)
    }
    w.close()
    new java.io.File(dir, "_SUCCESS").createNewFile()
    val readSchema = StructType(Seq(
      StructField("id", LongType), StructField("pad", StringType)))
    val back = Avro.read(spark, dir, readSchema, splitBytes = 8 << 10)
    assert(back.rdd.getNumPartitions > 1)
    assert(back.count() == 4000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
      == 4000L * 3999 / 2)
  }

  test("zero-shard write (all partitions empty) reads back as an empty DataFrame") {
    val dir = tmpDir()
    val empty = fixture.filter("id < 0")
    assert(Avro.write(empty, dir) == 0)
    val back = Avro.read(spark, dir, schema)
    assert(back.isEmpty && back.schema == schema)
  }

  test("reading a tree without _SUCCESS is refused") {
    val dir = tmpDir()
    Avro.write(fixture, dir)
    assert(new java.io.File(s"$dir/_SUCCESS").delete())
    val e = intercept[IllegalArgumentException](Avro.read(spark, dir, schema))
    assert(e.getMessage.contains("_SUCCESS"))
  }

  test("an explicit FILE path reads without marker or naming contract (foreign input)") {
    // the headline foreign case: one container from an external
    // producer, arbitrary name, no _SUCCESS anywhere
    val dir = tmpDir()
    val avroSchema = org.apache.avro.SchemaBuilder.record("ext").fields()
      .requiredLong("id").endRecord()
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](avroSchema))
    w.setSyncInterval(1024)
    w.create(avroSchema, new java.io.File(dir, "export-2024.avro"))
    (0 until 3000).foreach { i =>
      val rec = new org.apache.avro.generic.GenericData.Record(avroSchema)
      rec.put("id", i.toLong); w.append(rec)
    }
    w.close()
    val back = Avro.read(spark, s"$dir/export-2024.avro",
      StructType(Seq(StructField("id", LongType))), splitBytes = 4 << 10)
    assert(back.rdd.getNumPartitions > 1) // still split-parallel
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
      == 3000L * 2999 / 2)
  }

  test("a glob path reads an explicitly-selected foreign tree, marker-free") {
    val dir = tmpDir()
    val avroSchema = org.apache.avro.SchemaBuilder.record("ext").fields()
      .requiredLong("id").endRecord()
    // two foreign containers with arbitrary names, no _SUCCESS anywhere
    Seq("a.avro", "b.avro").zipWithIndex.foreach { case (name, fi) =>
      val w = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](avroSchema))
      w.create(avroSchema, new java.io.File(dir, name))
      (0 until 100).foreach { i =>
        val rec = new org.apache.avro.generic.GenericData.Record(avroSchema)
        rec.put("id", (fi * 100 + i).toLong); w.append(rec)
      }
      w.close()
    }
    val back = Avro.read(spark, s"$dir/*.avro", StructType(Seq(StructField("id", LongType))))
    assert(back.count() == 200)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
      == 200L * 199 / 2)
    // an empty glob is an explicit error, not a silent empty frame
    val e = intercept[IllegalArgumentException](
      Avro.read(spark, s"$dir/nope-*.avro", StructType(Seq(StructField("id", LongType)))))
    assert(e.getMessage.contains("matched no files"))
  }

  test("foreign avro enum and fixed fields read back as string/binary") {
    // a schema WE can't write (avro enum + fixed are not Spark types)
    // but a foreign producer can — the reader surfaces them through
    // the closest Spark types instead of refusing the file
    val dir = tmpDir()
    val avroSchema = org.apache.avro.SchemaBuilder.record("ext").fields()
      .requiredLong("id")
      .name("color").`type`().enumeration("Color").symbols("RED", "GREEN", "BLUE").noDefault()
      .name("digest").`type`().fixed("Digest").size(4).noDefault()
      .endRecord()
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](avroSchema))
    w.create(avroSchema, new java.io.File(dir, "ext.avro"))
    val rec = new org.apache.avro.generic.GenericData.Record(avroSchema)
    rec.put("id", 1L)
    rec.put("color", new org.apache.avro.generic.GenericData.EnumSymbol(
      avroSchema.getField("color").schema(), "GREEN"))
    rec.put("digest", new org.apache.avro.generic.GenericData.Fixed(
      avroSchema.getField("digest").schema(), Array[Byte](1, 2, 3, 4)))
    w.append(rec); w.close()
    val back = Avro.read(spark, s"$dir/ext.avro", StructType(Seq(
      StructField("id", LongType), StructField("color", StringType),
      StructField("digest", BinaryType)))).collect()
    assert(back.length == 1)
    assert(back(0).getString(1) == "GREEN")
    assert(back(0).getAs[Array[Byte]](2).toSeq == Seq[Byte](1, 2, 3, 4))
  }

  test("unsupported column types fail fast driver-side") {
    // avro maps are string-keyed; a long-keyed map has no encoding
    val df = spark.range(1).selectExpr("map(id, 'x') AS m")
    val e = intercept[IllegalArgumentException](Avro.write(df, "/tmp/never"))
    assert(e.getMessage.contains("unsupported Avro column type"))
  }

  private val nestedSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("info", StructType(Seq(
      StructField("name", StringType),
      StructField("deep", StructType(Seq(StructField("bal", DoubleType))))))),
    StructField("attrs", MapType(StringType, StringType)),
    StructField("counts", MapType(StringType, LongType)),
    StructField("day", DateType),
    StructField("ts", TimestampType),
    StructField("amount", DecimalType(12, 2)),
    StructField("inners", ArrayType(StructType(Seq(StructField("x", LongType)))))))

  private def nestedFixture = {
    val ts = java.sql.Timestamp.valueOf("2024-03-05 12:34:56.789")
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, Row("alpha", Row(10.5)), Map("k" -> "v", "k2" -> "w"), Map("n" -> 3L),
          java.sql.Date.valueOf("2024-03-05"), ts,
          new java.math.BigDecimal("12345.67"), Seq(Row(1L), Row(2L))),
        Row(2L, Row(null, null), Map.empty[String, String], null,
          null, null, new java.math.BigDecimal("-0.01"), Seq.empty[Row]),
        Row(3L, null, null, Map("z" -> -1L), java.sql.Date.valueOf("1969-12-31"),
          java.sql.Timestamp.valueOf("1969-12-31 23:59:59.999999"), null, null)
      ), 2), nestedSchema)
  }

  test("nested records, maps, date/timestamp/decimal logical types roundtrip") {
    val dir = tmpDir()
    Avro.write(nestedFixture, dir)
    val back = Avro.read(spark, dir, nestedSchema).collect().sortBy(_.getLong(0))
    assert(back.length == 3)
    val r1 = back(0)
    assert(r1.getStruct(1).getString(0) == "alpha")
    assert(r1.getStruct(1).getStruct(1).getDouble(0) == 10.5)
    assert(r1.getMap[String, String](2) == Map("k" -> "v", "k2" -> "w"))
    assert(r1.getMap[String, Long](3) == Map("n" -> 3L))
    assert(r1.getDate(4) == java.sql.Date.valueOf("2024-03-05"))
    assert(r1.getTimestamp(5) == java.sql.Timestamp.valueOf("2024-03-05 12:34:56.789"))
    assert(r1.getDecimal(6) == new java.math.BigDecimal("12345.67"))
    assert(r1.getSeq[Row](7).map(_.getLong(0)) == Seq(1L, 2L))
    val r2 = back(1)
    assert(r2.getStruct(1).isNullAt(0) && r2.getStruct(1).isNullAt(1))
    assert(r2.getMap[String, String](2).isEmpty && r2.isNullAt(3))
    assert(r2.isNullAt(4) && r2.isNullAt(5))
    assert(r2.getDecimal(6) == new java.math.BigDecimal("-0.01"))
    val r3 = back(2)
    // pre-epoch date and sub-second micros survive exactly
    assert(r3.getDate(4) == java.sql.Date.valueOf("1969-12-31"))
    assert(r3.getTimestamp(5) == java.sql.Timestamp.valueOf("1969-12-31 23:59:59.999999"))
    assert(r3.isNullAt(1) && r3.isNullAt(2) && r3.isNullAt(6) && r3.isNullAt(7))
  }

  test("nested/logical-type files carry standard Avro schemas a stock reader understands") {
    val dir = tmpDir()
    Avro.write(nestedFixture, dir)
    val part = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro")).head
    val reader = new org.apache.avro.file.DataFileReader(
      part, new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    try {
      import org.apache.avro.{LogicalTypes, Schema}
      import scala.jdk.CollectionConverters._
      val s = reader.getSchema
      def branch(f: String): Schema = {
        val fs = s.getField(f).schema()
        if (fs.getType == Schema.Type.UNION)
          fs.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
        else fs
      }
      assert(branch("info").getType == Schema.Type.RECORD)
      assert(branch("info").getField("deep") != null)
      assert(branch("attrs").getType == Schema.Type.MAP)
      assert(branch("day").getLogicalType == LogicalTypes.date())
      assert(branch("ts").getLogicalType == LogicalTypes.timestampMicros())
      assert(branch("amount").getLogicalType.isInstanceOf[LogicalTypes.Decimal])
      assert(branch("amount").getLogicalType.asInstanceOf[LogicalTypes.Decimal].getScale == 2)
      assert(branch("inners").getType == Schema.Type.ARRAY)
      // stock datum read of the first record's nested content
      val rec = reader.iterator().asScala.toSeq
        .sortBy(_.get("id").asInstanceOf[Long]).head
      val info = rec.get("info").asInstanceOf[org.apache.avro.generic.GenericRecord]
      assert(info.get("name").toString == "alpha")
      val attrs = rec.get("attrs").asInstanceOf[java.util.Map[Any, Any]]
      assert(attrs.asScala.map { case (k, v) => k.toString -> v.toString }.toMap
        == Map("k" -> "v", "k2" -> "w"))
    } finally reader.close()
  }

  test("multi-branch unions read as memberN structs with an inferred schema") {
    // a foreign producer's schema graft could never write: a 3-branch
    // union and a union holding a record branch, plus timestamp-millis
    val dir = tmpDir()
    import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val inner = SchemaBuilder.record("Inner").fields().requiredLong("a").endRecord()
    val tsMs = LogicalTypes.timestampMillis().addToSchema(Schema.create(Schema.Type.LONG))
    val avroSchema = SchemaBuilder.record("ext").fields()
      .requiredLong("id")
      .name("u").`type`().unionOf().intType().and().stringType().and().nullType()
      .endUnion().noDefault()
      .name("u2").`type`(Schema.createUnion(inner, Schema.create(Schema.Type.STRING))).noDefault()
      .name("ts_ms").`type`(tsMs).noDefault()
      .endRecord()
    val w = new org.apache.avro.file.DataFileWriter(
      new GenericDatumWriter[GenericRecord](avroSchema))
    w.create(avroSchema, new java.io.File(dir, "u.avro"))
    def rec(id: Long, u: Any, u2: Any): GenericRecord = {
      val r = new GenericData.Record(avroSchema)
      r.put("id", id); r.put("u", u); r.put("u2", u2); r.put("ts_ms", 1709640000123L)
      r
    }
    def innerRec(a: Long): GenericRecord = {
      val r = new GenericData.Record(inner); r.put("a", a); r
    }
    w.append(rec(1L, Int.box(42), innerRec(9L)))
    w.append(rec(2L, "hi", "plain"))
    w.append(rec(3L, null, innerRec(1L)))
    w.close()
    val df = Avro.read(spark, s"$dir/u.avro")
    val uType = df.schema("u").dataType.asInstanceOf[StructType]
    assert(uType.fieldNames.toSeq == Seq("member0", "member1"))
    assert(uType("member0").dataType == IntegerType && uType("member1").dataType == StringType)
    assert(df.schema("u2").dataType.asInstanceOf[StructType]("member0").dataType
      .isInstanceOf[StructType])
    assert(df.schema("ts_ms").dataType == TimestampType)
    val back = df.collect().sortBy(_.getLong(0))
    assert(back(0).getStruct(1).getInt(0) == 42 && back(0).getStruct(1).isNullAt(1))
    assert(back(0).getStruct(2).getStruct(0).getLong(0) == 9L)
    assert(back(1).getStruct(1).isNullAt(0) && back(1).getStruct(1).getString(1) == "hi")
    assert(back(1).getStruct(2).getString(1) == "plain")
    assert(back(2).isNullAt(1))
    assert(back(2).getStruct(2).getStruct(0).getLong(0) == 1L)
    // millis logical type scaled to a real timestamp, not read as micros
    assert(back(0).getTimestamp(3).getTime == 1709640000123L)
  }

  test("int/long and float/double unions promote to the wide Spark type") {
    val dir = tmpDir()
    import org.apache.avro.SchemaBuilder
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val avroSchema = SchemaBuilder.record("prom").fields()
      .requiredLong("id")
      .name("n").`type`().unionOf().intType().and().longType().and().nullType()
      .endUnion().noDefault()
      .name("x").`type`().unionOf().floatType().and().doubleType().endUnion().noDefault()
      .endRecord()
    val w = new org.apache.avro.file.DataFileWriter(
      new GenericDatumWriter[GenericRecord](avroSchema))
    w.create(avroSchema, new java.io.File(dir, "p.avro"))
    def rec(id: Long, n: Any, x: Any): GenericRecord = {
      val r = new GenericData.Record(avroSchema)
      r.put("id", id); r.put("n", n); r.put("x", x); r
    }
    w.append(rec(1L, Int.box(5), Float.box(1.5f)))
    w.append(rec(2L, Long.box(1L << 40), Double.box(2.25)))
    w.close()
    val df = Avro.read(spark, s"$dir/p.avro")
    assert(df.schema("n").dataType == LongType && df.schema("n").nullable)
    assert(df.schema("x").dataType == DoubleType && !df.schema("x").nullable)
    val back = df.collect().sortBy(_.getLong(0))
    assert(back(0).getLong(1) == 5L && back(0).getDouble(2) == 1.5)
    assert(back(1).getLong(1) == (1L << 40) && back(1).getDouble(2) == 2.25)
  }

  test("declared enum and fixed columns write as real avro enum/fixed") {
    val dir = tmpDir()
    val declared = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("color", StringType, nullable = true,
        metadata = Avro.enumMetadata(Seq("RED", "GREEN", "BLUE"))),
      StructField("digest", BinaryType, nullable = false, metadata = Avro.fixedMetadata(4)),
      StructField("tags", ArrayType(StringType, containsNull = false), nullable = false,
        metadata = Avro.enumMetadata(Seq("X", "Y")))))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, "GREEN", Array[Byte](1, 2, 3, 4), Seq("X", "Y")),
      Row(2L, null, Array[Byte](9, 8, 7, 6), Seq("Y"))), 1), declared)
    Avro.write(df, dir)
    // stock reader sees genuine enum/fixed schemas and values
    val part = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro")).head
    val reader = new org.apache.avro.file.DataFileReader(
      part, new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    try {
      import org.apache.avro.Schema
      import scala.jdk.CollectionConverters._
      val s = reader.getSchema
      def branch(f: String): Schema = {
        val fs = s.getField(f).schema()
        if (fs.getType == Schema.Type.UNION)
          fs.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
        else fs
      }
      assert(branch("color").getType == Schema.Type.ENUM)
      assert(branch("color").getEnumSymbols.asScala.toSeq == Seq("RED", "GREEN", "BLUE"))
      assert(branch("digest").getType == Schema.Type.FIXED && branch("digest").getFixedSize == 4)
      assert(branch("tags").getElementType.getType == Schema.Type.ENUM)
      val recs = reader.iterator().asScala.toSeq.sortBy(_.get("id").asInstanceOf[Long])
      assert(recs.head.get("color").isInstanceOf[org.apache.avro.generic.GenericData.EnumSymbol])
      assert(recs.head.get("color").toString == "GREEN")
      assert(recs.head.get("digest").asInstanceOf[org.apache.avro.generic.GenericFixed]
        .bytes().toSeq == Seq[Byte](1, 2, 3, 4))
    } finally reader.close()
    // graft reads its own enum/fixed back (inferred: string/binary)
    val back = Avro.read(spark, dir).collect().sortBy(_.getLong(0))
    assert(back(0).getString(1) == "GREEN" && back(1).isNullAt(1))
    assert(back(0).getAs[Array[Byte]](2).toSeq == Seq[Byte](1, 2, 3, 4))
    assert(back(0).getSeq[String](3) == Seq("X", "Y"))
    // a value outside the declared symbol table refuses to encode
    val bad = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(3L, "MAGENTA", Array[Byte](0, 0, 0, 0), Seq("X"))), 1), declared)
    val e = intercept[org.apache.spark.SparkException](Avro.write(bad, tmpDir()))
    assert(e.getMessage.contains("not a symbol") ||
      Option(e.getCause).exists(_.getMessage.contains("not a symbol")))
  }

  test("a 1-member avroUnion fails at schema construction, not at write time") {
    val declared = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("value", StructType(Seq(
        StructField("member0", LongType, nullable = true))),
        nullable = true, metadata = Avro.unionMetadata)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, Row(42L))), 1), declared)
    val e = intercept[Exception](Avro.write(df, tmpDir()))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("at least 2 member")),
      s"expected a clear schema-construction message, got: ${msgs(e).mkString(" | ")}")
  }

  test("declared union columns write as real multi-branch avro unions, roundtrip") {
    val dir = tmpDir()
    val declared = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("value", StructType(Seq(
        StructField("member0", LongType, nullable = true),
        StructField("member1", StringType, nullable = true))),
        nullable = true, metadata = Avro.unionMetadata)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, Row(42L, null)),
      Row(2L, Row(null, "hello")),
      Row(3L, null)), 1), declared)
    Avro.write(df, dir)
    // stock reader sees a genuine union[null, long, string] with BARE values
    val part = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro")).head
    val reader = new org.apache.avro.file.DataFileReader(
      part, new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    try {
      import org.apache.avro.Schema
      import scala.jdk.CollectionConverters._
      val fs = reader.getSchema.getField("value").schema()
      assert(fs.getType == Schema.Type.UNION)
      assert(fs.getTypes.asScala.map(_.getType).toSeq ==
        Seq(Schema.Type.NULL, Schema.Type.LONG, Schema.Type.STRING))
      val recs = reader.iterator().asScala.toSeq.sortBy(_.get("id").asInstanceOf[Long])
      assert(recs(0).get("value") == 42L)
      assert(recs(1).get("value").toString == "hello")
      assert(recs(2).get("value") == null)
    } finally reader.close()
    // graft reads its own union back as the memberN struct
    val back = Avro.read(spark, dir).collect().sortBy(_.getLong(0))
    assert(back(0).getStruct(1).getLong(0) == 42L && back(0).getStruct(1).isNullAt(1))
    assert(back(1).getStruct(1).isNullAt(0) && back(1).getStruct(1).getString(1) == "hello")
    assert(back(2).isNullAt(1))
    // two members set refuses to encode
    val bad = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(4L, Row(1L, "both"))), 1), declared)
    val e = intercept[org.apache.spark.SparkException](Avro.write(bad, tmpDir()))
    assert(e.getMessage.contains("exactly one member") ||
      Option(e.getCause).exists(_.getMessage.contains("exactly one member")))
  }
}
