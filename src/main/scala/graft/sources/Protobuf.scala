package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Generic protobuf file IO (reference: scio-avro/src/main/scala/com/
  * spotify/scio/avro/syntax/SCollectionSyntax.scala:187
  * `saveAsProtobufFile` and ScioContextSyntax.scala:189 `protobufFile`
  * — scio ships serialized proto messages inside Avro container
  * files, one `bytes` field per record, so the files ride existing
  * Avro tooling).
  *
  * No protobuf runtime exists on this classpath, so — exactly like
  * [[TfExample]] — the codec is a schema-driven implementation of the
  * PUBLIC proto3 wire format over [[TfExample]]'s varint/tag
  * primitives. Where TfExample hard-codes the 4-message `Example`
  * schema, this maps an ARBITRARY Spark `StructType` to a proto
  * message:
  *
  *   - field numbers: schema position + 1, or an explicit
  *     `protoField` metadata long on the StructField (for matching a
  *     .proto written elsewhere);
  *   - int/long/short/byte/bool → varint (wire 0, int64 semantics);
  *     float → fixed32; double → fixed64; string/binary →
  *     length-delimited (wire 2); integral columns may declare
  *     `protoFormat` metadata to match a .proto's sint (zigzag
  *     varint) or fixed/sfixed (fixed-width wire 1/5) field types;
  *   - Array[numeric] → packed (wire 2), Array[string|binary] →
  *     repeated wire-2 fields — both the proto3 defaults;
  *   - nested StructType → embedded message (wire 2), recursively;
  *     Array[Struct] → repeated message fields;
  *   - MapType → proto `map<K,V>`: repeated `message{K key=1; V value=2}`
  *     entries (the wire shape protoc generates for map fields); keys
  *     may be string/integral/bool, values any supported type; absent
  *     key/value fields decode to proto3 defaults ("", 0, false) the
  *     way stock parsers do, last entry wins on duplicate keys;
  *   - enum fields: a StringType (or Array[String]) column carrying
  *     `protoEnum` metadata (the symbol table, index = enum number)
  *     encodes as varint(s) — packed when repeated; decoding an enum
  *     number outside the declared table yields null (the unknown-enum
  *     case a generated parser parks in UNRECOGNIZED);
  *   - null / None → field omitted (proto3 absence), reads back null.
  *
  * Bytes produced here parse with stock `protoc`-generated code for
  * the equivalent .proto, and stock-encoded messages parse here: the
  * decoder tolerates any field order, unknown fields, and both packed
  * and unpacked repeated encodings — proto's compatibility contract
  * (verified in ProtobufSpec against hand-computed protoc wire bytes).
  *
  * Container: Avro `bytes` records via [[Avro]] (scio's layout — the
  * files open with any Avro tooling and the read is block-splittable)
  * or TFRecord framing via [[TfRecord]]. Encode/decode are pure
  * per-row kernels inside one mapPartitions pass: no shuffle, no
  * driver involvement, parallelism from the container's split/shard
  * structure.
  */
object Protobuf {

  import TfExample.{writeVarint, writeTag, writeLen, Reader}

  private def fieldNumber(f: StructField, idx: Int): Int =
    if (f.metadata.contains("protoField")) f.metadata.getLong("protoField").toInt
    else idx + 1

  private[sources] def checkType(dt: DataType): Unit = dt match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType |
         FloatType | DoubleType | StringType | BinaryType => ()
    case ArrayType(ByteType | ShortType | IntegerType | LongType | BooleanType |
                   FloatType | DoubleType | StringType | BinaryType, _) => ()
    case ArrayType(st: StructType, _) => // repeated message field
      st.fields.foreach(f => checkType(f.dataType))
    case st: StructType => st.fields.foreach(f => checkType(f.dataType))
    case MapType(kt, vt, _) => // proto map<K,V>
      kt match {
        case StringType | ByteType | ShortType | IntegerType | LongType | BooleanType => ()
        case other => throw new IllegalArgumentException(
          s"unsupported proto map key type $other (string/integral/bool per the proto spec)")
      }
      checkType(vt)
    case other => throw new IllegalArgumentException(
      s"unsupported proto column type $other (scalars, arrays of scalars, " +
        "nested structs, arrays of structs, maps)")
  }

  /** The map-entry message shape protoc generates for `map<K,V>`. */
  private def entrySchema(kt: DataType, vt: DataType): StructType =
    StructType(Seq(StructField("key", kt), StructField("value", vt)))

  /** proto3 scalar default — what an ABSENT key/value field inside a
    * map entry means on the wire (stock encoders omit defaults).
    */
  private def protoDefault(dt: DataType): Any = dt match {
    case StringType => ""
    case ByteType => 0.toByte
    case ShortType => 0.toShort
    case IntegerType => 0
    case LongType => 0L
    case BooleanType => false
    case FloatType => 0f
    case DoubleType => 0.0
    case BinaryType => Array.emptyByteArray
    case _ => null // message-typed: closest representable default
  }

  private def enumSymbols(f: StructField): Option[Array[String]] =
    if (f.metadata.contains("protoEnum")) Some(f.metadata.getStringArray("protoEnum")) else None

  /** Integral wire-format override: proto's non-default int encodings
    * — "zigzag" (sint32/sint64) and "fixed" (fixed32/sfixed32/
    * fixed64/sfixed64; width follows the Spark type: LongType → 64-bit
    * wire 1, Int/Short/Byte → 32-bit wire 5). Default (no metadata)
    * stays plain varint int64 semantics.
    */
  private def wireFormat(f: StructField): Option[String] =
    if (f.metadata.contains("protoFormat")) Some(f.metadata.getString("protoFormat")) else None

  /** Attach a proto wire-format declaration ("zigzag" | "fixed") to an
    * integral column's metadata — for matching a .proto that uses
    * sint / fixed / sfixed field types.
    */
  def formatMetadata(format: String): Metadata = {
    require(format == "zigzag" || format == "fixed",
      s"unknown protoFormat '$format' (zigzag|fixed)")
    new MetadataBuilder().putString("protoFormat", format).build()
  }

  private def zigzagEncode(dt: DataType, v: Any): Long = dt match {
    case LongType =>
      val n = v.asInstanceOf[Number].longValue(); (n << 1) ^ (n >> 63)
    case _ => // 32-bit zigzag, then as unsigned
      val n = v.asInstanceOf[Number].intValue()
      ((n << 1) ^ (n >> 31)).toLong & 0xFFFFFFFFL
  }

  private def zigzagDecode(dt: DataType, u: Long): Any = {
    val n = (u >>> 1) ^ -(u & 1L)
    castIntegral(dt, n)
  }

  /** Attach a proto enum symbol table to a string column's metadata
    * (index = enum number) — the declaration [[write]]/[[read]] keys
    * enum encoding off.
    */
  def enumMetadata(symbols: Seq[String]): Metadata =
    new MetadataBuilder().putStringArray("protoEnum", symbols.toArray).build()

  // ---- encode --------------------------------------------------------

  private def packedNumeric(dt: DataType, xs: scala.collection.Seq[Any]): Array[Byte] =
    dt match {
      case FloatType =>
        val buf = ByteBuffer.allocate(4 * xs.size).order(ByteOrder.LITTLE_ENDIAN)
        xs.foreach(x => buf.putFloat(x.asInstanceOf[Number].floatValue()))
        buf.array()
      case DoubleType =>
        val buf = ByteBuffer.allocate(8 * xs.size).order(ByteOrder.LITTLE_ENDIAN)
        xs.foreach(x => buf.putDouble(x.asInstanceOf[Number].doubleValue()))
        buf.array()
      case _ => // integral / boolean → packed varints
        val out = new ByteArrayOutputStream()
        xs.foreach {
          case b: Boolean => writeVarint(out, if (b) 1L else 0L)
          case n: Number => writeVarint(out, n.longValue())
          case other => throw new IllegalArgumentException(s"non-numeric packed value $other")
        }
        out.toByteArray
    }

  private def writeField(out: ByteArrayOutputStream, field: Int, dt: DataType, v: Any): Unit =
    dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        writeTag(out, field, 0); writeVarint(out, v.asInstanceOf[Number].longValue())
      case BooleanType =>
        writeTag(out, field, 0); writeVarint(out, if (v.asInstanceOf[Boolean]) 1L else 0L)
      case FloatType =>
        writeTag(out, field, 5)
        out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
          .putFloat(v.asInstanceOf[Number].floatValue()).array())
      case DoubleType =>
        writeTag(out, field, 1)
        out.write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
          .putDouble(v.asInstanceOf[Number].doubleValue()).array())
      case StringType =>
        writeLen(out, field, v.asInstanceOf[String].getBytes(StandardCharsets.UTF_8))
      case BinaryType =>
        writeLen(out, field, v.asInstanceOf[Array[Byte]])
      case ArrayType(StringType, _) =>
        v.asInstanceOf[scala.collection.Seq[_]].foreach(x =>
          writeLen(out, field, x.asInstanceOf[String].getBytes(StandardCharsets.UTF_8)))
      case ArrayType(BinaryType, _) =>
        v.asInstanceOf[scala.collection.Seq[_]].foreach(x =>
          writeLen(out, field, x.asInstanceOf[Array[Byte]]))
      case ArrayType(st: StructType, _) => // repeated message: one wire-2 field each
        v.asInstanceOf[scala.collection.Seq[_]].foreach(x =>
          writeLen(out, field, encodeRow(st, x.asInstanceOf[Row])))
      case ArrayType(et, _) =>
        val xs = v.asInstanceOf[scala.collection.Seq[Any]]
        if (xs.nonEmpty) writeLen(out, field, packedNumeric(et, xs))
      case st: StructType =>
        writeLen(out, field, encodeRow(st, v.asInstanceOf[Row]))
      case MapType(kt, vt, _) => // one entry message per pair, protoc's map shape
        val es = entrySchema(kt, vt)
        v.asInstanceOf[scala.collection.Map[Any, Any]].foreach { case (k, x) =>
          writeLen(out, field, encodeRow(es, Row(k, x)))
        }
      case other => throw new IllegalArgumentException(s"unsupported proto column type $other")
    }

  private def writeFormattedField(out: ByteArrayOutputStream, field: Int, f: StructField,
                                  fmt: String, v: Any): Unit = {
    val (et, isArray) = f.dataType match {
      case ArrayType(t, _) => (t, true)
      case t => (t, false)
    }
    et match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"protoFormat '$fmt' requires an integral column, got $other on ${f.name}")
    }
    def putFixed(b: ByteArrayOutputStream, x: Any): Unit =
      if (et == LongType)
        b.write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
          .putLong(x.asInstanceOf[Number].longValue()).array())
      else
        b.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
          .putInt(x.asInstanceOf[Number].intValue()).array())
    (fmt, isArray) match {
      case ("zigzag", false) =>
        writeTag(out, field, 0); writeVarint(out, zigzagEncode(et, v))
      case ("zigzag", true) => // packed sints, the proto3 repeated default
        val xs = v.asInstanceOf[scala.collection.Seq[_]]
        if (xs.nonEmpty) {
          val payload = new ByteArrayOutputStream()
          xs.foreach(x => writeVarint(payload, zigzagEncode(et, x)))
          writeLen(out, field, payload.toByteArray)
        }
      case ("fixed", false) =>
        writeTag(out, field, if (et == LongType) 1 else 5); putFixed(out, v)
      case ("fixed", true) => // packed fixed-width
        val xs = v.asInstanceOf[scala.collection.Seq[_]]
        if (xs.nonEmpty) {
          val payload = new ByteArrayOutputStream()
          xs.foreach(x => putFixed(payload, x))
          writeLen(out, field, payload.toByteArray)
        }
      case (other, _) => throw new IllegalArgumentException(
        s"unknown protoFormat '$other' (zigzag|fixed)")
    }
  }

  private def writeEnumField(out: ByteArrayOutputStream, field: Int, f: StructField,
                             syms: Array[String], v: Any): Unit = {
    def number(s: String): Long = {
      val n = syms.indexOf(s)
      require(n >= 0, s"value '$s' of enum field ${f.name} not in declared symbols " +
        syms.mkString("[", ",", "]"))
      n.toLong
    }
    f.dataType match {
      case StringType =>
        writeTag(out, field, 0); writeVarint(out, number(v.asInstanceOf[String]))
      case ArrayType(StringType, _) => // packed, the proto3 repeated-enum default
        val xs = v.asInstanceOf[scala.collection.Seq[_]]
        if (xs.nonEmpty) {
          val payload = new ByteArrayOutputStream()
          xs.foreach(x => writeVarint(payload, number(x.asInstanceOf[String])))
          writeLen(out, field, payload.toByteArray)
        }
      case other => throw new IllegalArgumentException(
        s"protoEnum metadata requires a string or array<string> column, got $other")
    }
  }

  /** Serialize one Row as a proto message over `schema`. Null cells
    * are omitted (proto3 absence); fields encode in schema order so
    * equal rows produce identical bytes.
    */
  def encodeRow(schema: StructType, row: Row): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var i = 0
    while (i < schema.fields.length) {
      if (!row.isNullAt(i)) {
        val f = schema.fields(i)
        (enumSymbols(f), wireFormat(f)) match {
          case (Some(syms), _) => writeEnumField(out, fieldNumber(f, i), f, syms, row.get(i))
          case (_, Some(fmt)) => writeFormattedField(out, fieldNumber(f, i), f, fmt, row.get(i))
          case _ => writeField(out, fieldNumber(f, i), f.dataType, row.get(i))
        }
      }
      i += 1
    }
    out.toByteArray
  }

  // ---- decode --------------------------------------------------------

  private def readScalar(r: Reader, wire: Int, dt: DataType): Any = (dt, wire) match {
    case (ByteType, 0) => r.varint().toByte
    case (ShortType, 0) => r.varint().toShort
    case (IntegerType, 0) => r.varint().toInt
    case (LongType, 0) => r.varint()
    case (BooleanType, 0) => r.varint() != 0L
    case (FloatType, 5) => r.float()
    case (DoubleType, 1) => r.double()
    case (StringType, 2) => new String(r.sliceBytes(), StandardCharsets.UTF_8)
    case (BinaryType, 2) => r.sliceBytes()
    case (_, w) => r.skip(w); null // wire/type mismatch → treat as unknown
  }

  /** Parse proto message bytes into a Row of `schema`. Unknown fields
    * skip; missing fields read null; repeated fields accept packed and
    * unpacked encodings; last-wins on duplicate scalar fields (proto's
    * merge rule).
    */
  def decodeRow(schema: StructType, bytes: Array[Byte]): Row = {
    val byNumber = schema.fields.zipWithIndex
      .map { case (f, i) => fieldNumber(f, i) -> i }.toMap
    val cells = new Array[Any](schema.fields.length)
    val builders = new Array[scala.collection.mutable.ArrayBuffer[Any]](schema.fields.length)
    val mapBuilders =
      new Array[scala.collection.mutable.LinkedHashMap[Any, Any]](schema.fields.length)
    val r = new Reader(bytes, 0, bytes.length)
    while (r.hasMore) {
      val tag = r.varint(); val field = (tag >> 3).toInt; val wire = (tag & 7).toInt
      byNumber.get(field) match {
        case None => r.skip(wire)
        case Some(i) if enumSymbols(schema.fields(i)).isDefined =>
          val syms = enumSymbols(schema.fields(i)).get
          def sym(n: Long): Any = if (n >= 0 && n < syms.length) syms(n.toInt) else null
          schema.fields(i).dataType match {
            case ArrayType(_, _) =>
              if (builders(i) == null)
                builders(i) = scala.collection.mutable.ArrayBuffer.empty[Any]
              wire match {
                case 2 => // packed
                  val p = r.lenDelimited(); while (p.hasMore) builders(i) += sym(p.varint())
                case 0 => builders(i) += sym(r.varint())
                case w => r.skip(w)
              }
            case _ =>
              if (wire == 0) cells(i) = sym(r.varint()) else r.skip(wire)
          }
        case Some(i) if wireFormat(schema.fields(i)).isDefined =>
          val f = schema.fields(i)
          val fmt = wireFormat(f).get
          f.dataType match {
            case ArrayType(et, _) =>
              if (builders(i) == null)
                builders(i) = scala.collection.mutable.ArrayBuffer.empty[Any]
              wire match {
                case 2 => // packed
                  val p = r.lenDelimited()
                  if (fmt == "zigzag") while (p.hasMore) builders(i) += zigzagDecode(et, p.varint())
                  else if (et == LongType) while (p.hasMore) builders(i) += p.fixed64()
                  else while (p.hasMore) builders(i) += castIntegral(et, p.fixed32().toLong)
                case 0 if fmt == "zigzag" => builders(i) += zigzagDecode(et, r.varint())
                case 1 if fmt == "fixed" && et == LongType => builders(i) += r.fixed64()
                case 5 if fmt == "fixed" && et != LongType =>
                  builders(i) += castIntegral(et, r.fixed32().toLong)
                case w => r.skip(w)
              }
            case et =>
              wire match {
                case 0 if fmt == "zigzag" => cells(i) = zigzagDecode(et, r.varint())
                case 1 if fmt == "fixed" && et == LongType => cells(i) = r.fixed64()
                case 5 if fmt == "fixed" && et != LongType =>
                  cells(i) = castIntegral(et, r.fixed32().toLong)
                case w => r.skip(w)
              }
          }
        case Some(i) =>
          val dt = schema.fields(i).dataType
          dt match {
            case ArrayType(et, _) =>
              if (builders(i) == null)
                builders(i) = scala.collection.mutable.ArrayBuffer.empty[Any]
              (et, wire) match {
                case (st: StructType, 2) =>
                  builders(i) += decodeRow(st, r.sliceBytes())
                case (StringType | BinaryType, 2) =>
                  builders(i) += readScalar(r, 2, et)
                case (FloatType, 2) =>
                  val p = r.lenDelimited(); while (p.hasMore) builders(i) += p.float()
                case (DoubleType, 2) =>
                  val p = r.lenDelimited()
                  while (p.hasMore) builders(i) += readScalar(p, 1, DoubleType)
                case (_, 2) => // packed varints
                  val p = r.lenDelimited()
                  while (p.hasMore) builders(i) += castIntegral(et, p.varint())
                case (FloatType, 5) => builders(i) += r.float()
                case (DoubleType, 1) => builders(i) += readScalar(r, 1, DoubleType)
                case (_, 0) => builders(i) += castIntegral(et, r.varint())
                case (_, w) => r.skip(w)
              }
            case st: StructType =>
              // same mismatch tolerance as readScalar: a non-wire-2
              // payload under a message-typed field number is skipped,
              // not read as a length (which would corrupt the parse)
              if (wire == 2) cells(i) = decodeRow(st, r.sliceBytes())
              else r.skip(wire)
            case MapType(kt, vt, _) =>
              if (wire == 2) {
                if (mapBuilders(i) == null)
                  mapBuilders(i) = scala.collection.mutable.LinkedHashMap.empty[Any, Any]
                val entry = decodeRow(entrySchema(kt, vt), r.sliceBytes())
                // absent entry fields mean proto3 defaults (stock
                // encoders omit default keys/values); last entry wins
                val k = if (entry.isNullAt(0)) protoDefault(kt) else entry.get(0)
                mapBuilders(i)(k) = if (entry.isNullAt(1)) protoDefault(vt) else entry.get(1)
              } else r.skip(wire)
            case scalar =>
              cells(i) = readScalar(r, wire, scalar)
          }
      }
    }
    var i = 0
    while (i < cells.length) {
      if (builders(i) != null) cells(i) = builders(i).toSeq
      if (mapBuilders(i) != null) cells(i) = mapBuilders(i).toMap
      i += 1
    }
    Row.fromSeq(cells.toSeq)
  }

  private def castIntegral(dt: DataType, v: Long): Any = dt match {
    case ByteType => v.toByte
    case ShortType => v.toShort
    case IntegerType => v.toInt
    case BooleanType => v != 0L
    case _ => v
  }

  // ---- Spark surface ---------------------------------------------------

  /** Avro container schema scio uses for proto payloads: one `bytes`
    * field per record (AvroBytesUtil layout).
    */
  private[sources] val bytesSchema = StructType(Seq(StructField("bytes", BinaryType, nullable = false)))

  /** Save each row as one serialized proto message. `container`:
    * `"avro"` (scio's layout — bytes records in Avro container files,
    * block-splittable on read) or `"tfrecord"` (TFRecord framing).
    * Returns the shard count.
    */
  def write(df: DataFrame, path: String, container: String = "avro"): Int = {
    val schema = df.schema
    schema.fields.foreach(f => checkType(f.dataType)) // fail fast, driver-side
    implicit val enc = Encoders.BINARY
    val payloads = df.mapPartitions(rows => rows.map(encodeRow(schema, _))).toDF("bytes")
    container match {
      case "avro" => Avro.write(payloads, path)
      case "tfrecord" => TfRecord.write(payloads.withColumnRenamed("bytes", "value"), path)
      case other => throw new IllegalArgumentException(
        s"unknown proto container '$other' (avro|tfrecord)")
    }
  }

  /** Read proto messages written by [[write]] (or any producer of the
    * same layout) back into rows of `schema`.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
           container: String = "avro"): DataFrame = {
    schema.fields.foreach(f => checkType(f.dataType))
    val raw = container match {
      case "avro" => Avro.read(spark, path, bytesSchema)
      case "tfrecord" => TfRecord.read(spark, path).select(col("value").as("bytes"))
      case other => throw new IllegalArgumentException(
        s"unknown proto container '$other' (avro|tfrecord)")
    }
    implicit val enc = RowEncoder.encoderFor(schema)
    raw.mapPartitions(rows => rows.map(r => decodeRow(schema, r.getAs[Array[Byte]](0))))
  }
}
