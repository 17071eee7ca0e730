package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Randomized (seeded, reproducible) coverage for the hand-rolled
  * proto wire format and the framed media container — the two pieces
  * of hand-written binary encoding in graft. No SparkSession needed:
  * these are pure kernels.
  */
class TfExamplePropertySpec extends AnyFunSuite {
  import TfExample._

  private val Trials = 300

  private def genName(r: Random): String = {
    val base = r.alphanumeric.take(1 + r.nextInt(12)).mkString
    r.nextInt(3) match {
      case 0 => base
      case 1 => base + "/é✓"   // non-ascii keys
      case _ => "_" + base
    }
  }

  private def genBytes(r: Random): Array[Byte] = {
    val a = new Array[Byte](r.nextInt(20))
    r.nextBytes(a)
    a
  }

  private def genFeature(r: Random): TfFeature = r.nextInt(3) match {
    case 0 => Int64Feature(Seq.fill(r.nextInt(6))(r.nextLong()))
    case 1 => FloatFeature(Seq.fill(r.nextInt(6))(
      java.lang.Float.intBitsToFloat(r.nextInt()) match {
        case f if f.isNaN => 1.5f // NaN != NaN breaks equality asserts, not the codec
        case f => f
      }))
    case _ => BytesFeature(Seq.fill(r.nextInt(4))(genBytes(r)))
  }

  private def genExample(r: Random): Map[String, TfFeature] =
    Seq.fill(r.nextInt(8))(genName(r) -> genFeature(r)).toMap

  test("encode/decode is the identity on random feature maps (incl. bit-pattern floats)") {
    val r = new Random(1234)
    (1 to Trials).foreach { _ =>
      val ex = genExample(r)
      val back = decode(encode(ex))
      assert(back.keySet == ex.keySet)
      ex.foreach {
        case (k, BytesFeature(vs)) =>
          assert(back(k).asInstanceOf[BytesFeature].values.map(_.toSeq) == vs.map(_.toSeq))
        case (k, f) => assert(back(k) == f)
      }
    }
  }

  test("encoding is deterministic regardless of map construction order") {
    val r = new Random(99)
    (1 to Trials).foreach { _ =>
      val ex = genExample(r)
      assert(encode(ex).toSeq == encode(ex.toSeq.reverse.toMap).toSeq)
    }
  }

  test("decoder never hangs or corrupts on arbitrary garbage") {
    val r = new Random(7)
    (1 to Trials).foreach { _ =>
      val junk = genBytes(new Random(r.nextLong())) ++ genBytes(r)
      try { decode(junk); () } catch { case _: Exception => () }
    }
    // and on every truncation of a VALID example
    val valid = encode(Map("a" -> Int64Feature(Seq(1L, -1L)),
      "b" -> BytesFeature(Seq("payload".getBytes))))
    (0 until valid.length).foreach { cut =>
      try { decode(valid.take(cut)); () } catch { case _: Exception => () }
    }
  }

  test("pack/unpackFrames is the identity on random frame lists") {
    val r = new Random(42)
    (1 to Trials).foreach { _ =>
      val frames = Seq.fill(r.nextInt(6))(genBytes(r))
      val back = graft.multimodal.Multimodal.unpackFrames(
        graft.multimodal.Multimodal.packFrames(frames))
      assert(back.map(_.toSeq) == frames.map(_.toSeq))
    }
  }

  test("unpackFrames on any truncation yields an exact frame prefix") {
    val r = new Random(5)
    (1 to Trials).foreach { _ =>
      val frames = Seq.fill(1 + r.nextInt(5))(genBytes(r))
      val packed = graft.multimodal.Multimodal.packFrames(frames)
      val cut = r.nextInt(packed.length + 1)
      val got = graft.multimodal.Multimodal.unpackFrames(packed.take(cut))
      assert(got.length <= frames.length)
      got.zip(frames).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
    }
  }
}
