package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Typed TFRecord: tf.train.Example encode/decode (reference:
  * scio-tensorflow/src/main/scala/com/spotify/scio/tensorflow/syntax/
  * SCollectionSyntax.scala:35 `saveAsTfRecordFile` over Example).
  * This environment has no protobuf runtime, so the encoder is a
  * hand-rolled implementation of the PUBLIC proto3 wire format for
  * the 4-message Example schema — ~100 lines, no dependency:
  *
  *   message BytesList { repeated bytes value = 1; }
  *   message FloatList { repeated float value = 1 [packed=true]; }
  *   message Int64List { repeated int64 value = 1 [packed=true]; }
  *   message Feature  { oneof { BytesList=1 FloatList=2 Int64List=3 } }
  *   message Features { map<string, Feature> feature = 1; }
  *   message Example  { Features features = 1; }
  *
  * Bytes produced here parse with any stock TensorFlow reader, and
  * stock TF-written Examples parse here (the decoder tolerates any
  * field order and unknown fields — proto's compatibility contract).
  * Encoding writes map entries in sorted-key order so equal rows
  * produce identical bytes (proto serializers don't guarantee this;
  * determinism makes outputs hashable/diffable).
  *
  * Scale shape: encode/decode are pure per-row kernels running inside
  * the same mapPartitions pass as [[TfRecord]]'s framing — no shuffle,
  * no driver involvement; parallelism remains the file/partition
  * count.
  */
object TfExample {

  sealed trait TfFeature
  final case class BytesFeature(values: Seq[Array[Byte]]) extends TfFeature
  final case class FloatFeature(values: Seq[Float]) extends TfFeature
  final case class Int64Feature(values: Seq[Long]) extends TfFeature

  // ---- proto wire primitives ---------------------------------------

  private[sources] def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0L) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  /** tag = (fieldNumber << 3) | wireType */
  private[sources] def writeTag(out: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    writeVarint(out, ((field << 3) | wire).toLong)

  private[sources] def writeLen(out: ByteArrayOutputStream, field: Int, bytes: Array[Byte]): Unit = {
    writeTag(out, field, 2)
    writeVarint(out, bytes.length.toLong)
    out.write(bytes)
  }

  // ---- encode --------------------------------------------------------

  private def encodeFeature(f: TfFeature): Array[Byte] = {
    val inner = new ByteArrayOutputStream()
    f match {
      case BytesFeature(vs) => // BytesList: repeated bytes value = 1
        val bl = new ByteArrayOutputStream()
        vs.foreach(v => writeLen(bl, 1, v))
        writeLen(inner, 1, bl.toByteArray) // Feature.bytes_list = 1
      case FloatFeature(vs) => // FloatList: packed floats, field 1
        val fl = new ByteArrayOutputStream()
        val buf = ByteBuffer.allocate(4 * vs.size).order(ByteOrder.LITTLE_ENDIAN)
        vs.foreach(buf.putFloat)
        writeLen(fl, 1, buf.array())
        writeLen(inner, 2, fl.toByteArray) // Feature.float_list = 2
      case Int64Feature(vs) => // Int64List: packed varints, field 1
        val il = new ByteArrayOutputStream()
        val packed = new ByteArrayOutputStream()
        vs.foreach(writeVarint(packed, _))
        writeLen(il, 1, packed.toByteArray)
        writeLen(inner, 3, il.toByteArray) // Feature.int64_list = 3
    }
    inner.toByteArray
  }

  /** Serialize a tf.train.Example; map entries in sorted-key order
    * (deterministic bytes for equal content).
    */
  def encode(features: Map[String, TfFeature]): Array[Byte] = {
    val fs = new ByteArrayOutputStream()
    features.toSeq.sortBy(_._1).foreach { case (name, f) =>
      val entry = new ByteArrayOutputStream() // map entry: key=1, value=2
      writeLen(entry, 1, name.getBytes(StandardCharsets.UTF_8))
      writeLen(entry, 2, encodeFeature(f))
      writeLen(fs, 1, entry.toByteArray) // Features.feature = 1
    }
    val ex = new ByteArrayOutputStream()
    writeLen(ex, 1, fs.toByteArray) // Example.features = 1
    ex.toByteArray
  }

  // ---- decode --------------------------------------------------------

  /** Every read is bounds-checked against `end`: a truncated or
    * corrupt stream fails with a clean "truncated proto" IOException
    * instead of reading past a nested message's boundary into sibling
    * bytes (or out of the buffer entirely) — the containment contract
    * stock proto parsers enforce via pushLimit.
    */
  private[sources] final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    private def need(n: Int): Unit =
      if (n < 0 || pos + n > end)
        throw new java.io.IOException(
          s"truncated proto: need $n bytes at $pos, message ends at $end")
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        need(1)
        val b = buf(pos); pos += 1
        v |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
        if (shift > 63) throw new java.io.IOException("varint too long")
      }
      v // unreachable
    }
    def lenDelimited(): Reader = {
      val n = varint().toInt
      need(n)
      val r = new Reader(buf, pos, pos + n)
      pos += n
      r
    }
    def sliceBytes(): Array[Byte] = {
      val n = varint().toInt
      need(n)
      val a = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n
      a
    }
    def float(): Float = {
      need(4)
      val f = ByteBuffer.wrap(buf, pos, 4).order(ByteOrder.LITTLE_ENDIAN).getFloat
      pos += 4
      f
    }
    /** Raw little-endian 32-bit word (proto fixed32/sfixed32). */
    def fixed32(): Int = {
      need(4)
      val v = ByteBuffer.wrap(buf, pos, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      pos += 4
      v
    }
    /** Raw little-endian 64-bit word (proto fixed64/sfixed64). */
    def fixed64(): Long = {
      need(8)
      val v = ByteBuffer.wrap(buf, pos, 8).order(ByteOrder.LITTLE_ENDIAN).getLong
      pos += 8
      v
    }
    def double(): Double = {
      need(8)
      val d = ByteBuffer.wrap(buf, pos, 8).order(ByteOrder.LITTLE_ENDIAN).getDouble
      pos += 8
      d
    }
    /** Skip an unknown field of the given wire type (compat contract). */
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => need(8); pos += 8
      case 2 => val n = varint().toInt; need(n); pos += n
      case 5 => need(4); pos += 4
      case w => throw new java.io.IOException(s"unsupported wire type $w")
    }
  }

  private def decodeFeature(r: Reader): TfFeature = {
    var out: TfFeature = null
    while (r.hasMore) {
      val tag = r.varint(); val field = (tag >> 3).toInt; val wire = (tag & 7).toInt
      field match {
        case 1 => // BytesList
          val bl = r.lenDelimited()
          val vs = Seq.newBuilder[Array[Byte]]
          while (bl.hasMore) {
            val t = bl.varint()
            if ((t >> 3).toInt == 1) vs += bl.sliceBytes() else bl.skip((t & 7).toInt)
          }
          out = BytesFeature(vs.result())
        case 2 => // FloatList: packed or (legal per proto3) unpacked
          val fl = r.lenDelimited()
          val vs = Seq.newBuilder[Float]
          while (fl.hasMore) {
            val t = fl.varint()
            ((t >> 3).toInt, (t & 7).toInt) match {
              case (1, 2) =>
                val packed = fl.lenDelimited()
                while (packed.hasMore) vs += packed.float()
              case (1, 5) => vs += fl.float()
              case (_, w) => fl.skip(w)
            }
          }
          out = FloatFeature(vs.result())
        case 3 => // Int64List: packed or unpacked varints
          val il = r.lenDelimited()
          val vs = Seq.newBuilder[Long]
          while (il.hasMore) {
            val t = il.varint()
            ((t >> 3).toInt, (t & 7).toInt) match {
              case (1, 2) =>
                val packed = il.lenDelimited()
                while (packed.hasMore) vs += packed.varint()
              case (1, 0) => vs += il.varint()
              case (_, w) => il.skip(w)
            }
          }
          out = Int64Feature(vs.result())
        case _ => r.skip(wire)
      }
    }
    if (out == null) BytesFeature(Nil) else out
  }

  /** Parse a serialized tf.train.Example into its feature map.
    * Unknown fields and any field order are tolerated.
    */
  def decode(example: Array[Byte]): Map[String, TfFeature] = {
    val out = Map.newBuilder[String, TfFeature]
    val ex = new Reader(example, 0, example.length)
    while (ex.hasMore) {
      val tag = ex.varint()
      if ((tag >> 3).toInt == 1 && (tag & 7).toInt == 2) {
        val fs = ex.lenDelimited() // Features
        while (fs.hasMore) {
          val ft = fs.varint()
          if ((ft >> 3).toInt == 1 && (ft & 7).toInt == 2) {
            val entry = fs.lenDelimited()
            var key: String = null
            var value: TfFeature = null
            while (entry.hasMore) {
              val et = entry.varint()
              ((et >> 3).toInt, (et & 7).toInt) match {
                case (1, 2) => key = new String(entry.sliceBytes(), StandardCharsets.UTF_8)
                case (2, 2) => value = decodeFeature(entry.lenDelimited())
                case (_, w) => entry.skip(w)
              }
            }
            if (key != null && value != null) out += key -> value
          } else fs.skip((ft & 7).toInt)
        }
      } else ex.skip((tag & 7).toInt)
    }
    out.result()
  }

  // ---- Spark surface ---------------------------------------------------

  /** Supported column shapes for schema-driven Example IO. */
  private def toFeature(dt: DataType, v: Any): TfFeature = (dt, v) match {
    case (ByteType | ShortType | IntegerType | LongType, n: Number) =>
      Int64Feature(Seq(n.longValue()))
    case (BooleanType, b: Boolean) => Int64Feature(Seq(if (b) 1L else 0L))
    case (FloatType | DoubleType, n: Number) => FloatFeature(Seq(n.floatValue()))
    case (StringType, s: String) => BytesFeature(Seq(s.getBytes(StandardCharsets.UTF_8)))
    case (BinaryType, b: Array[Byte]) => BytesFeature(Seq(b))
    case (ArrayType(LongType | IntegerType, _), xs: scala.collection.Seq[_]) =>
      Int64Feature(xs.map(_.asInstanceOf[Number].longValue()).toSeq)
    case (ArrayType(FloatType | DoubleType, _), xs: scala.collection.Seq[_]) =>
      FloatFeature(xs.map(_.asInstanceOf[Number].floatValue()).toSeq)
    case (ArrayType(StringType, _), xs: scala.collection.Seq[_]) =>
      BytesFeature(xs.map(_.asInstanceOf[String].getBytes(StandardCharsets.UTF_8)).toSeq)
    case (dt, _) => throw new IllegalArgumentException(
      s"unsupported Example column type $dt (int/long/bool/float/double/string/binary " +
        "and arrays of long/float/string)")
  }

  private def fromFeature(dt: DataType, f: TfFeature): Any = (dt, f) match {
    case (ByteType, Int64Feature(vs)) => vs.headOption.map(_.toByte).orNull
    case (ShortType, Int64Feature(vs)) => vs.headOption.map(_.toShort).orNull
    case (IntegerType, Int64Feature(vs)) => vs.headOption.map(_.toInt).orNull
    case (LongType, Int64Feature(vs)) => vs.headOption.orNull
    case (BooleanType, Int64Feature(vs)) => vs.headOption.map(_ != 0L).orNull
    case (FloatType, FloatFeature(vs)) => vs.headOption.orNull
    case (DoubleType, FloatFeature(vs)) => vs.headOption.map(_.toDouble).orNull
    case (StringType, BytesFeature(vs)) =>
      vs.headOption.map(new String(_, StandardCharsets.UTF_8)).orNull
    case (BinaryType, BytesFeature(vs)) => vs.headOption.orNull
    case (ArrayType(LongType, _), Int64Feature(vs)) => vs
    case (ArrayType(IntegerType, _), Int64Feature(vs)) => vs.map(_.toInt)
    case (ArrayType(FloatType, _), FloatFeature(vs)) => vs
    case (ArrayType(DoubleType, _), FloatFeature(vs)) => vs.map(_.toDouble)
    case (ArrayType(StringType, _), BytesFeature(vs)) =>
      vs.map(new String(_, StandardCharsets.UTF_8))
    case (dt, f) => throw new IllegalArgumentException(
      s"Example feature ${f.getClass.getSimpleName} does not match requested type $dt")
  }

  /** Save a DataFrame as TFRecord-framed tf.train.Examples, one per
    * row, every column a feature named by the column. Null cells are
    * omitted from the Example (TF's missing-feature convention).
    * Returns the shard count ([[TfRecord.write]]'s contract).
    */
  def write(df: DataFrame, path: String): Int = {
    val schema = df.schema
    schema.foreach(f => toFeature(f.dataType, zeroOf(f.dataType))) // fail fast on types
    implicit val enc = Encoders.BINARY
    val payloads = df.mapPartitions { rows =>
      rows.map { r =>
        val feats = schema.fields.iterator.zipWithIndex.flatMap { case (f, i) =>
          if (r.isNullAt(i)) None else Some(f.name -> toFeature(f.dataType, r.get(i)))
        }.toMap
        encode(feats)
      }
    }.toDF("value")
    TfRecord.write(payloads, path)
  }

  /** A representative value per type, for the fail-fast type check. */
  private def zeroOf(dt: DataType): Any = dt match {
    case ByteType => 0.toByte
    case ShortType => 0.toShort
    case IntegerType => 0
    case LongType => 0L
    case BooleanType => false
    case FloatType => 0f
    case DoubleType => 0d
    case StringType => ""
    case BinaryType => Array.emptyByteArray
    case ArrayType(e, _) => scala.collection.Seq(zeroOf(e))
    case other => other // toFeature raises the real error
  }

  /** Read TFRecord-framed Examples back into rows of `schema`.
    * Features absent from an Example surface as nulls; extra features
    * in the record are ignored (proto compatibility both ways).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    implicit val enc = RowEncoder.encoderFor(schema)
    TfRecord.read(spark, path).select(col("value"))
      .mapPartitions { rows =>
        rows.map { r =>
          val fm = decode(r.getAs[Array[Byte]](0))
          Row.fromSeq(schema.fields.toSeq.map(f =>
            fm.get(f.name).map(fromFeature(f.dataType, _)).orNull))
        }
      }
  }
}
