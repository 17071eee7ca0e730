package graft.testing

/** Scio-test-parity assertions for approximate outputs (sketch results).
  *
  * Reference: scio-test/core/src/main/scala/com/spotify/scio/testing/
  * ApproximationAssertions.scala:78 (`withErrorRate`) and :102
  * (`withErrorRatePerKey`). Same contract: each actual value must land in
  * `[expected - expected/100*pct, expected + expected/100*pct]` — the
  * bound uses the reference's integer-percent arithmetic so specs written
  * against scio port over value-for-value.
  */
object ApproximationAssertions {

  trait ApproximationAssertion[-T] {
    def assert(value: T): Unit
  }

  implicit class ApproximationAssertionsImplicits[T](private val value: T) extends AnyVal {
    def shouldApproximate(a: ApproximationAssertion[T]): Unit = a.assert(value)
  }

  private def inRange(act: Long, expt: Long, errorPct: Double, label: String): Unit = {
    // Reference arithmetic (ApproximationAssertions.scala:85): integer
    // division first, then scale — preserved for parity.
    val error = ((expt / 100) * errorPct).toLong
    if (act > expt + error || act < expt - error)
      throw new AssertionError(
        s"$label: actual $act outside [${expt - error}, ${expt + error}] (expected $expt ± $errorPct%)"
      )
  }

  /** Pairwise positional compare: actual(i) within errorPct of expected(i). */
  def withErrorRate(
      expected: Iterable[Long],
      errorPct: Double
  ): ApproximationAssertion[Iterable[Long]] = { (actual: Iterable[Long]) =>
    val a = actual.toSeq
    val e = expected.toSeq
    if (a.size != e.size)
      throw new AssertionError(s"size mismatch: actual ${a.size} vs expected ${e.size}")
    a.zip(e).zipWithIndex.foreach { case ((act, expt), i) =>
      inRange(act, expt, errorPct, s"index $i")
    }
  }

  /** Keyed compare: for each actual (k, v), v within errorPct of expected(k). */
  def withErrorRatePerKey[K](
      expected: Iterable[(K, Long)],
      errorPct: Double
  ): ApproximationAssertion[Iterable[(K, Long)]] = { (actual: Iterable[(K, Long)]) =>
    val ex = expected.toMap
    val a = actual.toSeq
    if (a.size != ex.size)
      throw new AssertionError(s"size mismatch: actual ${a.size} vs expected ${ex.size}")
    a.foreach { case (k, act) =>
      ex.get(k) match {
        case Some(expt) => inRange(act, expt, errorPct, s"key $k")
        case None       => throw new AssertionError(s"unexpected key $k in actual")
      }
    }
  }
}
