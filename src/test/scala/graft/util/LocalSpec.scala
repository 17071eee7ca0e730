package graft.util

import org.scalatest.funsuite.AnyFunSuite

import Local._

class LocalSpec extends AnyFunSuite {

  test("top returns the greatest num descending, bounded by input size") {
    assert(Seq(3, 1, 4, 1, 5, 9, 2, 6).localTop(3) == Seq(9, 6, 5))
    assert(Seq(3, 1).localTop(5) == Seq(3, 1))
    assert(Seq.empty[Int].localTop(2) == Seq.empty)
    assert(Seq("b", "a", "c").localTop(2)(Ordering[String].reverse) == Seq("a", "b"))
    intercept[IllegalArgumentException](Seq(1).localTop(0))
  }

  test("top matches full-sort semantics on random data (bounded heap correctness)") {
    val r = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val xs = Seq.fill(200)(r.nextInt(1000))
      assert(xs.localTop(10) == xs.sorted(Ordering[Int].reverse).take(10))
    }
  }

  test("topByKey keeps num per key, descending") {
    val xs = Seq("a" -> 1, "a" -> 5, "a" -> 3, "b" -> 2, "b" -> 9)
    assert(xs.localTopByKey(2) == Map("a" -> Seq(5, 3), "b" -> Seq(9, 2)))
  }

  test("fixed windows partition the timestamp space, skipping empty windows") {
    val xs = Seq(1L, 3L, 9L, 10L, 11L, 25L)
    val w = xs.iterator.timeSeries(identity).fixed(10).toSeq
    assert(w == Seq(Seq(1L, 3L, 9L), Seq(10L, 11L), Seq(25L)))
    // offset shifts the boundaries: [-5,5) [5,15) [15,25)
    val o = Seq(1L, 6L, 14L, 15L).iterator.timeSeries(identity).fixed(10, 5).toSeq
    assert(o == Seq(Seq(1L), Seq(6L, 14L), Seq(15L)))
  }

  test("session windows split on gaps >= gapDuration") {
    val xs = Seq(1L, 2L, 9L, 10L, 20L)
    assert(xs.iterator.timeSeries(identity).session(5).toSeq ==
      Seq(Seq(1L, 2L), Seq(9L, 10L), Seq(20L)))
    // exactly-gap spacing starts a new session (strict <)
    assert(Seq(0L, 5L).iterator.timeSeries(identity).session(5).toSeq ==
      Seq(Seq(0L), Seq(5L)))
  }

  test("sliding windows overlap by period and re-anchor across empty stretches") {
    // ts=1 lies in BOTH [-5,5) and [0,10) — early elements get their
    // full window fan-out (the pre-r9 clamp silently dropped the
    // below-zero-start window, merging the head of the stream)
    val w = Seq(1L, 4L, 8L, 12L).iterator.timeSeries(identity).sliding(10, 5).toSeq
    assert(w == Seq(Seq(1L, 4L), Seq(1L, 4L, 8L), Seq(8L, 12L), Seq(12L)))
    // an element repeats in ceil(size/period) windows
    val dense = Seq(7L).iterator.timeSeries(identity).sliding(10, 5).toSeq
    assert(dense == Seq(Seq(7L), Seq(7L)))
    // a long empty stretch re-anchors instead of emitting empty windows
    val sparse = Seq(1L, 100L).iterator.timeSeries(identity).sliding(10, 5).toSeq
    assert(sparse == Seq(Seq(1L), Seq(1L), Seq(100L), Seq(100L)))
    // pre-epoch timestamps window correctly (true floored division)
    val neg = Seq(-13L, -4L, 3L).iterator.timeSeries(identity).fixed(10).toSeq
    assert(neg == Seq(Seq(-13L), Seq(-4L), Seq(3L)))
  }

  test("sliding with period > size discards gap elements (documented)") {
    val w = Seq(0L, 7L, 10L).iterator.timeSeries(identity).sliding(5, 10).toSeq
    assert(w == Seq(Seq(0L), Seq(10L))) // 7 falls in the [5,10) gap
  }
}
