package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Randomized (seeded, reproducible) roundtrip coverage for the
  * generic schema-driven proto3 wire codec — random schemas, random
  * rows, byte-level determinism. Pure kernels, no SparkSession.
  */
class ProtobufPropertySpec extends AnyFunSuite {

  private val Trials = 200

  private def genScalarType(r: Random): DataType = r.nextInt(8) match {
    case 0 => ByteType
    case 1 => ShortType
    case 2 => IntegerType
    case 3 => LongType
    case 4 => BooleanType
    case 5 => FloatType
    case 6 => DoubleType
    case _ => if (r.nextBoolean()) StringType else BinaryType
  }

  private def genType(r: Random, depth: Int): DataType = r.nextInt(5) match {
    case 0 | 1 => genScalarType(r)
    case 2 => ArrayType(genScalarType(r))
    case 3 if depth < 2 => // repeated message
      ArrayType(StructType((1 to 1 + r.nextInt(2)).map(i =>
        StructField(s"m$i", genScalarType(r)))))
    case _ if depth < 2 =>
      StructType((1 to 1 + r.nextInt(3)).map(i =>
        StructField(s"n$i", genType(r, depth + 1))))
    case _ => genScalarType(r)
  }

  private def genValue(r: Random, dt: DataType): Any =
    if (r.nextInt(5) == 0) null
    else dt match {
      case ByteType => r.nextInt().toByte
      case ShortType => r.nextInt().toShort
      case IntegerType => r.nextInt()
      case LongType => r.nextLong()
      case BooleanType => r.nextBoolean()
      case FloatType =>
        val f = java.lang.Float.intBitsToFloat(r.nextInt())
        if (f.isNaN) 2.5f else f
      case DoubleType =>
        val d = java.lang.Double.longBitsToDouble(r.nextLong())
        if (d.isNaN) 2.5 else d
      case StringType => r.alphanumeric.take(r.nextInt(16)).mkString + "é✓"
      case BinaryType =>
        val a = new Array[Byte](r.nextInt(24)); r.nextBytes(a); a
      case ArrayType(et, _) =>
        Seq.fill(r.nextInt(5))(genValue(new Random(r.nextLong()), et))
          .map(v => if (v == null) genNonNull(r, et) else v) // proto3: no null elements
      case st: StructType =>
        Row.fromSeq(st.fields.toSeq.map(f => genValue(r, f.dataType)))
      case other => throw new IllegalStateException(other.toString)
    }

  private def genNonNull(r: Random, dt: DataType): Any = {
    var v: Any = null
    while (v == null) v = genValue(r, dt)
    v
  }

  private def sameValue(dt: DataType, a: Any, b: Any): Boolean = (dt, a, b) match {
    case (_, null, null) => true
    case (_, null, _) | (_, _, null) => false
    case (BinaryType, x: Array[Byte], y: Array[Byte]) => x.sameElements(y)
    case (ArrayType(et, _), xs: Seq[_], ys: Seq[_]) =>
      xs.size == ys.size && xs.zip(ys).forall { case (x, y) => sameValue(et, x, y) }
    case (st: StructType, x: Row, y: Row) => sameRow(st, x, y)
    case (_, x, y) => x == y
  }

  private def sameRow(schema: StructType, a: Row, b: Row): Boolean =
    schema.fields.indices.forall { i =>
      // an EMPTY numeric-array writes nothing on the wire (packed
      // absence) and legally reads back null — proto3's contract
      val emptyAbsent = schema.fields(i).dataType match {
        case ArrayType(_, _) =>
          a.get(i).asInstanceOf[Seq[_]] != null &&
            a.get(i).asInstanceOf[Seq[_]].isEmpty && b.isNullAt(i)
        case _ => false
      }
      emptyAbsent || sameValue(schema.fields(i).dataType, a.get(i), b.get(i))
    }

  test("random schema + random rows roundtrip; encoding is deterministic") {
    val seed = 20260813L
    (0 until Trials).foreach { t =>
      val r = new Random(seed + t)
      val schema = StructType((1 to 1 + r.nextInt(6)).map(i =>
        StructField(s"f$i", genType(r, 0))))
      val row = Row.fromSeq(schema.fields.toSeq.map(f => genValue(r, f.dataType)))
      val bytes = Protobuf.encodeRow(schema, row)
      val bytes2 = Protobuf.encodeRow(schema, row)
      assert(java.util.Arrays.equals(bytes, bytes2), s"trial $t: non-deterministic bytes")
      val back = Protobuf.decodeRow(schema, bytes)
      assert(sameRow(schema, row, back), s"trial $t: roundtrip mismatch\n$schema\n$row\n$back")
    }
  }

  test("extreme varint values roundtrip (Long.MinValue/MaxValue, negatives)") {
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", IntegerType),
      StructField("xs", ArrayType(LongType))))
    val row = Row(Long.MinValue, Int.MinValue,
      Seq(Long.MaxValue, -1L, 0L, Long.MinValue))
    val back = Protobuf.decodeRow(schema, Protobuf.encodeRow(schema, row))
    assert(back.getLong(0) == Long.MinValue && back.getInt(1) == Int.MinValue)
    assert(back.getSeq[Long](2) == Seq(Long.MaxValue, -1L, 0L, Long.MinValue))
  }
}
