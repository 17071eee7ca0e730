package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Avro Object Container File IO (reference: scio-avro/src/main/scala/
  * com/spotify/scio/avro/ — avroFile/saveAsAvroFile over GenericRecord).
  *
  * The `spark-avro` DataSource connector isn't on this classpath, but
  * the core Apache Avro library IS (Spark ships avro-1.12 for its own
  * shuffle/serde) — so this implements the PUBLIC Avro container
  * format directly: files written here open with any stock Avro
  * tooling (`DataFileStream`, avro-tools, BigQuery loads) and stock
  * Avro files read back, including snappy/deflate-coded blocks (the
  * codecs ride in the container header).
  *
  * Scale shape: one container file per partition on write
  * (dot-prefixed temp + rename commit, `_SUCCESS` stamp); the READ is
  * block-splittable — OCF interleaves a 16-byte sync marker between
  * blocks precisely so readers can split a container at arbitrary
  * byte offsets (each task rebases to the next marker, exactly the
  * Hadoop AvroRecordReader protocol). A single 100 GB container from
  * an external producer fans out to length/splitBytes tasks instead
  * of serializing on one core.
  *
  * Type mapping (both directions): long/int/short/byte ↔ long|int,
  * double/float, boolean, string, binary ↔ bytes; nested StructType ↔
  * record; MapType(string, V) ↔ avro map; DateType ↔ int/`date`;
  * TimestampType ↔ long/`timestamp-micros`; DecimalType(p,s) ↔
  * bytes/`decimal` — the standard Avro logical types, so stock readers
  * surface real dates/timestamps/decimals; arrays of any of these.
  * Nullable Spark fields (and nullable array elements / map values)
  * map to `union {null, T}`.
  */
object Avro {

  import org.apache.avro.LogicalTypes

  private def nullable(s: Schema, isNullable: Boolean): Schema =
    if (isNullable) Schema.createUnion(Schema.create(Schema.Type.NULL), s) else s

  /** Resolve the non-null branch of a union (Avro's nullable shape);
    * any other schema passes through.
    */
  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s

  /** `path` names nested records — Avro requires every record schema
    * be uniquely named, so the field path becomes the record name.
    */
  private def avroType(dt: DataType, path: String): Schema = dt match {
    case LongType => Schema.create(Schema.Type.LONG)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale).addToSchema(Schema.create(Schema.Type.BYTES))
    case ArrayType(et, containsNull) =>
      Schema.createArray(nullable(avroType(et, s"${path}_item"), containsNull))
    case MapType(StringType, vt, valueContainsNull) => // avro maps are string-keyed
      Schema.createMap(nullable(avroType(vt, s"${path}_value"), valueContainsNull))
    case st: StructType => toAvroSchema(st, s"${path}_record")
    case other => throw new IllegalArgumentException(
      s"unsupported Avro column type $other (numeric/boolean/string/binary/date/" +
        "timestamp/decimal, nested structs, string-keyed maps, + arrays)")
  }

  /** Spark schema → Avro record schema (nullable → union{null, T}). */
  def toAvroSchema(schema: StructType, recordName: String = "graft_record"): Schema = {
    val fields = schema.fields.map { f =>
      val ft = nullable(avroType(f.dataType, f.name), f.nullable)
      new Schema.Field(f.name, ft, null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(recordName, null, "graft", false, fields.toList.asJava)
  }

  /** `schema` is the (possibly union-wrapped) Avro schema of this
    * value — needed to build nested GenericRecords and to carry the
    * decimal scale.
    */
  private def toAvroValue(dt: DataType, schema: Schema, v: Any): Any = (dt, v) match {
    case (_, null) => null
    case (ShortType, x: Short) => x.toInt
    case (ByteType, x: Byte) => x.toInt
    case (BinaryType, b: Array[Byte]) => java.nio.ByteBuffer.wrap(b)
    case (DateType, d: java.sql.Date) => d.toLocalDate.toEpochDay.toInt
    case (DateType, d: java.time.LocalDate) => d.toEpochDay.toInt
    case (TimestampType, t: java.sql.Timestamp) =>
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    case (TimestampType, t: java.time.Instant) =>
      t.getEpochSecond * 1000000L + t.getNano / 1000L
    case (d: DecimalType, x: java.math.BigDecimal) =>
      java.nio.ByteBuffer.wrap(
        x.setScale(d.scale, java.math.RoundingMode.UNNECESSARY).unscaledValue().toByteArray)
    case (ArrayType(et, _), xs: scala.collection.Seq[_]) =>
      val es = nonNull(nonNull(schema).getElementType)
      xs.map(x => toAvroValue(et, es, x)).toList.asJava
    case (MapType(StringType, vt, _), m: scala.collection.Map[_, _]) =>
      val vs = nonNull(nonNull(schema).getValueType)
      val jm = new java.util.LinkedHashMap[String, Any]()
      m.foreach { case (k, x) => jm.put(k.toString, toAvroValue(vt, vs, x)) }
      jm
    case (st: StructType, row: Row) =>
      val rs = nonNull(schema)
      val rec = new GenericData.Record(rs)
      var i = 0
      while (i < st.fields.length) {
        rec.put(i, toAvroValue(st.fields(i).dataType, rs.getFields.get(i).schema(), row.get(i)))
        i += 1
      }
      rec
    case (_, x) => x // long/int/double/float/boolean/string pass through
  }

  private def fromAvroValue(dt: DataType, v: Any): Any = (dt, v) match {
    case (_, null) => null
    case (StringType, s) => s.toString // Utf8 → String
    case (ShortType, x: Integer) => x.shortValue()
    case (ByteType, x: Integer) => x.byteValue()
    case (BinaryType, bb: java.nio.ByteBuffer) =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case (BinaryType, gf: org.apache.avro.generic.GenericFixed) =>
      gf.bytes().clone() // foreign avro `fixed` fields surface as binary
    case (DateType, d: Integer) => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d.toLong))
    case (TimestampType, micros: java.lang.Long) =>
      val t = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
      t
    case (d: DecimalType, bb: java.nio.ByteBuffer) =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a)
      new java.math.BigDecimal(new java.math.BigInteger(a), d.scale)
    case (ArrayType(et, _), xs: java.util.Collection[_]) =>
      xs.asScala.map(x => fromAvroValue(et, x)).toSeq
    case (MapType(StringType, vt, _), m: java.util.Map[_, _]) =>
      m.asScala.map { case (k, x) => k.toString -> fromAvroValue(vt, x) }.toMap
    case (st: StructType, rec: GenericRecord) =>
      // name-matched like the top level: container fields absent from
      // the asked-for struct are ignored, missing ones read null
      Row.fromSeq(st.fields.toSeq.map { f =>
        val af = rec.getSchema.getField(f.name)
        if (af == null) null else fromAvroValue(f.dataType, rec.get(af.pos()))
      })
    case (_, x) => x
  }

  /** Write one Avro container file per partition under `path`
    * (repartition upstream to pick the shard count). Same commit
    * protocol as [[TfRecord.write]]: dot-prefixed temp + rename,
    * `_SUCCESS` stamp. Returns the shard count.
    *
    * `syncIntervalBytes` (0 = Avro's default, ~64 KiB) sets the
    * approximate block size between sync markers — the granularity at
    * which [[read]] can split the file.
    */
  def write(df: DataFrame, path: String, syncIntervalBytes: Int = 0): Int = {
    val schema = df.schema
    toAvroSchema(schema) // fail fast on unsupported types, driver-side
    val avroJson = toAvroSchema(schema).toString
    val spark = df.sparkSession
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(hadoopConf)
    fs.delete(dir, true)
    fs.mkdirs(dir)
    val confEntries = spark.sparkContext.broadcast(
      hadoopConf.iterator().asScala.map(e => e.getKey -> e.getValue).toMap)
    val fieldTypes = schema.fields.map(_.dataType)
    val shards = df.rdd.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val taskConf = new Configuration(false)
        confEntries.value.foreach { case (k, v) => taskConf.set(k, v) }
        val ctx = TaskContext.get()
        val part = ctx.partitionId()
        val finalFile = new Path(f"$path%s/part-$part%05d.avro")
        val tempFile = new Path(f"$path%s/.part-$part%05d.attempt-${ctx.taskAttemptId()}%d")
        val fsTask = finalFile.getFileSystem(taskConf)
        val avroSchema = new Schema.Parser().parse(avroJson)
        val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](avroSchema))
        if (syncIntervalBytes > 0) writer.setSyncInterval(syncIntervalBytes)
        val out = writer.create(avroSchema, fsTask.create(tempFile, true))
        try {
          val fieldSchemas = avroSchema.getFields.asScala.map(_.schema()).toArray
          it.foreach { row =>
            val rec = new GenericData.Record(avroSchema)
            var i = 0
            while (i < fieldTypes.length) {
              rec.put(i, toAvroValue(fieldTypes(i), fieldSchemas(i), row.get(i)))
              i += 1
            }
            out.append(rec)
          }
        } finally out.close()
        if (!fsTask.rename(tempFile, finalFile)) fsTask.delete(tempFile, false)
        Iterator.single(1)
      }
    }.count().toInt
    fs.create(new Path(s"$path/_SUCCESS"), true).close()
    shards
  }

  /** [[org.apache.avro.file.SeekableInput]] over a Hadoop stream —
    * what lets DataFileReader seek to a split offset and rebase on the
    * next sync marker.
    */
  private class HadoopSeekableInput(in: org.apache.hadoop.fs.FSDataInputStream, len: Long)
      extends org.apache.avro.file.SeekableInput {
    override def read(b: Array[Byte], off: Int, l: Int): Int = in.read(b, off, l)
    override def seek(pos: Long): Unit = in.seek(pos)
    override def tell(): Long = in.getPos
    override def length(): Long = len
    override def close(): Unit = in.close()
  }

  /** Read Avro container files under `path` into rows of `schema`
    * (name-matched; container fields absent from `schema` are
    * ignored, `schema` fields absent from a record read as null —
    * Avro's own evolution contract). `path` may be a graft-written
    * directory, a single container FILE, or a GLOB (`dir/` + `*.avro`)
    * selecting foreign files explicitly.
    *
    * SPLITTABLE: each container is cut into ~`splitBytes` byte ranges
    * and every range is one task. A task seeks to its range start,
    * scans forward to the next OCF sync marker, and reads whole blocks
    * until the first block starting past its range end — the standard
    * Hadoop Avro split protocol, so every record is read exactly once
    * regardless of where the cuts land. Parallelism no longer depends
    * on the writer's shard count: one huge external container file
    * still fans out.
    *
    * Guard rails: a DIRECTORY path requires the `_SUCCESS` stamp
    * ([[write]] emits one) so a partially-written tree from a failed
    * job can't read back as silently-valid data, and a committed
    * write whose partitions were all empty (zero part files) reads as
    * an empty DataFrame of `schema` rather than throwing. A path that
    * points at a FILE is read directly, no marker or naming contract
    * — the foreign-container case (one huge .avro from an external
    * producer) this read's splitting exists for.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
           splitBytes: Long = 64L << 20): DataFrame = {
    require(splitBytes > 0, s"splitBytes must be positive, got $splitBytes")
    val fieldNames = schema.fields.map(_.name)
    val fieldTypes = schema.fields.map(_.dataType)
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(hadoopConf)
    val statuses =
      if (path.exists(c => "*?[{".indexOf(c.toInt) >= 0)) {
        // explicit glob: the caller names the files, no marker contract
        val matched = Option(fs.globStatus(dir)).getOrElse(Array.empty).filter(_.isFile)
        require(matched.nonEmpty, s"glob $path matched no files")
        matched
      } else {
        val rootStatus = fs.getFileStatus(dir)
        if (rootStatus.isFile) Array(rootStatus)
        else {
          require(fs.exists(new Path(dir, "_SUCCESS")),
            s"$path has no _SUCCESS marker — refusing to read a possibly partial write " +
              "(point at the container file itself, or glob the files, for foreign input)")
          Option(fs.globStatus(new Path(dir, "part-*.avro"))).getOrElse(Array.empty)
        }
      }
    if (statuses.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    val confEntries = spark.sparkContext.broadcast(
      hadoopConf.iterator().asScala.map(e => e.getKey -> e.getValue).toMap)
    val splits = statuses.toSeq.flatMap { st =>
      val len = st.getLen
      val n = math.max(1L, (len + splitBytes - 1) / splitBytes)
      (0L until n).map(i =>
        (st.getPath.toString, i * splitBytes, math.min((i + 1) * splitBytes, len), len))
    }
    val rows = spark.sparkContext.parallelize(splits, splits.size)
      .flatMap { case (file, start, end, len) =>
        val taskConf = new Configuration(false)
        confEntries.value.foreach { case (k, v) => taskConf.set(k, v) }
        val p = new Path(file)
        val reader = new DataFileReader(
          new HadoopSeekableInput(p.getFileSystem(taskConf).open(p), len),
          new GenericDatumReader[GenericRecord]())
        Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](_ => reader.close()))
        // the OCF header ends with the sync marker, so sync(0) lands on
        // the first block; blocks whose preceding marker sits in
        // [start, end) belong to this split
        reader.sync(start)
        new Iterator[Row] {
          override def hasNext: Boolean = reader.hasNext && !reader.pastSync(end)
          override def next(): Row = {
            val rec = reader.next()
            Row.fromSeq(fieldNames.indices.map { i =>
              val f = rec.getSchema.getField(fieldNames(i))
              if (f == null) null else fromAvroValue(fieldTypes(i), rec.get(f.pos()))
            })
          }
        }
      }
    spark.createDataFrame(rows, schema)
  }
}
