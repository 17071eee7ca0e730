package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters, Passed, Exhausted}

import graft.hash.ScalableBloom
import graft.operators.Splits
import graft.util.Local

/** ScalaCheck property suites over the PURE driver-side kernels —
  * the pieces whose correctness the distributed operators inherit
  * (split thresholds, scalable-Bloom growth, local top-k,
  * time-series windowing). Runs hundreds of generated cases per
  * property without touching a Spark job.
  */
class PropertySpec extends AnyFunSuite {

  private def holds(p: Prop, n: Int = 200): Unit = {
    val r = check(Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.status == Passed || r.status == Exhausted, r.status.toString)
    assert(r.succeeded > 0)
  }

  private val weights: Gen[List[Double]] =
    Gen.nonEmptyListOf(Gen.choose(1e-3, 100.0)).map(_.take(20))

  test("thresholds: monotone, span-complete, proportional to weights") {
    holds(forAll(weights) { ws =>
      val splits = ws.zipWithIndex.map { case (w, i) => s"s$i" -> w }
      val t = Splits.thresholds(splits)
      val span = 1L << 32
      val monotone = t.zip(t.tail).forall { case (a, b) => a <= b }
      val complete = t.last == span
      val total = ws.sum
      val proportional = t.zip(ws.scanLeft(0.0)(_ + _).tail).forall {
        case (bound, cum) => math.abs(bound - cum / total * span) <= span * 1e-9 + 1
      }
      monotone && complete && proportional
    })
  }

  test("ScalableBloom: NO false negative survives arbitrary growth") {
    val inserts: Gen[List[Long]] = Gen.listOfN(500, Gen.choose(Long.MinValue, Long.MaxValue))
    holds(forAll(inserts) { xs =>
      // tiny initial capacity forces multiple slices for any real list
      val sb = ScalableBloom(initialCapacity = 16, fpp = 0.05)
      xs.foreach(sb.putLong)
      xs.forall(sb.mightContainLong)
    }, n = 60)
  }

  test("ScalableBloom: false-positive rate stays near the budget under 10x growth") {
    val sb = ScalableBloom(initialCapacity = 64, fpp = 0.01)
    (1L to 5000L).foreach(sb.putLong)
    val fp = (1_000_000L to 1_020_000L).count(sb.mightContainLong)
    // geometric tightening keeps the COMPOUND rate bounded; allow 4x
    // the per-slice budget for the stacked filters
    assert(fp <= 20000 * 0.04, s"fp=$fp of 20000")
    assert(sb.numFilters > 1, "growth must actually have happened")
  }

  test("Local.top agrees with sort.take for any input and n") {
    val gen = for {
      xs <- Gen.listOf(Gen.choose(-1000, 1000))
      n <- Gen.choose(0, 30)
    } yield (xs, n)
    holds(forAll(gen) { case (xs, n) =>
      n == 0 || Local.top(xs, n)(Ordering.Int.reverse) == xs.sorted.take(n)
    })
  }

  test("TimeSeries.fixed: windows partition the stream, bounds respected") {
    val gen = for {
      ts <- Gen.listOf(Gen.choose(0L, 100000L)).map(_.sorted)
      size <- Gen.choose(1L, 5000L)
    } yield (ts, size)
    holds(forAll(gen) { case (ts, size) =>
      val windows = Local.TimeSeriesOps(ts.iterator).timeSeries(identity).fixed(size).toList
      val flat = windows.flatten
      val partitioned = flat == ts
      val bounded = windows.forall { w =>
        w.nonEmpty && (w.max / size) == (w.min / size)
      }
      partitioned && bounded
    }, n = 100)
  }

  test("TimeSeries.session: gaps inside a session < gap; between sessions >= gap") {
    val gen = for {
      ts <- Gen.listOf(Gen.choose(0L, 100000L)).map(_.sorted)
      gap <- Gen.choose(1L, 5000L)
    } yield (ts, gap)
    holds(forAll(gen) { case (ts, gap) =>
      val sessions = Local.TimeSeriesOps(ts.iterator).timeSeries(identity).session(gap).toList
      val partitioned = sessions.flatten == ts
      val inside = sessions.forall(s =>
        s.zip(s.tail).forall { case (a, b) => b - a < gap })
      val between = sessions.zip(sessions.drop(1)).forall {
        case (a, b) => b.head - a.last >= gap
      }
      partitioned && inside && between
    }, n = 100)
  }
}
