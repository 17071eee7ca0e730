package graft.operators

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical distributions score ~0; a shift scores large") {
    val ref = (1 to 10000).map(i => (i % 1000).toDouble).toDF("v")
    val same = (1 to 10000).map(i => ((i * 7) % 1000).toDouble).toDF("v")
    val shifted = (1 to 10000).map(i => (i % 1000) * 3.0 + 2000).toDF("v")
    assert(Drift.psi(ref, same, "v") < 0.01)
    assert(Drift.psi(ref, shifted, "v") > 0.25, "a full distribution shift must flag")
  }

  test("psiBuckets: all buckets present, probabilities sum to ~1, floors applied") {
    val ref = (1 to 1000).map(_.toDouble).toDF("v")
    val cur = (1 to 100).map(_.toDouble).toDF("v")   // everything in low buckets
    val rows = Drift.psiBuckets(ref, cur, "v", nBuckets = 10).collect()
    assert(rows.map(_.getInt(0)).toSeq == (0 until 10))
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-3)
    // empty current buckets get the 1e-6 floor, not -inf contributions
    assert(rows.forall(r => !r.getDouble(5).isInfinite && !r.getDouble(5).isNaN))
    assert(rows.map(_.getLong(2)).sum == 100L)
  }

  test("nulls are excluded; guard on bucket count") {
    val ref = Seq(Some(1.0), None, Some(2.0), Some(3.0), Some(4.0)).toDF("v")
    val rows = Drift.psiBuckets(ref, ref, "v", nBuckets = 2).collect()
    assert(rows.map(_.getLong(1)).sum == 4L)
    intercept[IllegalArgumentException](Drift.psiBuckets(ref, ref, "v", nBuckets = 1))
  }
}
