package graft.operators

import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Int, Double, Double, Long)] =
    df.collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3))).toSeq

  test("explicit boundaries: half-open, last inclusive, out-of-range ignored, empty bucket zero") {
    val df = Seq(0.0, 0.5, 1.0, 1.5, 2.0, -1.0, 2.5).toDF("v")
    val h = rows(Stats.histogram(df, "v", Array(0.0, 1.0, 2.0)))
    // [0,1): {0.0, 0.5}; [1,2]: {1.0, 1.5, 2.0} — 2.0 lands in the LAST
    // bucket (inclusive upper); -1.0 and 2.5 ignored
    assert(h == Seq((0, 0.0, 1.0, 2L), (1, 1.0, 2.0, 3L)))
    val empty = rows(Stats.histogram(Seq(5.0).toDF("v"), "v", Array(0.0, 1.0, 4.0, 6.0)))
    assert(empty.map(_._4) == Seq(0L, 0L, 1L))
  }

  test("bucketCount form: even widths over observed min/max; min==max collapses") {
    val df = (0 to 100).map(_.toDouble).toDF("v")
    val h = rows(Stats.histogram(df, "v", 4))
    assert(h.map(_._4).sum == 101L)
    assert(h.size == 4 && h.head._2 == 0.0 && h.last._3 == 100.0)
    val flat = rows(Stats.histogram(Seq(7.0, 7.0).toDF("v"), "v", 5))
    assert(flat == Seq((0, 7.0, 7.0, 2L)))
  }

  test("guards: reference contract on empty/NaN input and bad boundaries") {
    intercept[IllegalArgumentException](
      Stats.histogram(Seq.empty[Double].toDF("v"), "v", 3))
    intercept[IllegalArgumentException](
      Stats.histogram(Seq(1.0, Double.NaN).toDF("v"), "v", 3))
    intercept[IllegalArgumentException](
      Stats.histogram(Seq(1.0).toDF("v"), "v", Array(2.0, 1.0)))
    intercept[IllegalArgumentException](
      Stats.histogram(Seq(1.0).toDF("v"), "v", Array(1.0)))
  }
}
