package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  // 64×64 grid, shuffled arrival order
  private def grid = {
    val rnd = new scala.util.Random(3)
    rnd.shuffle((for (x <- 0 until 64; y <- 0 until 64) yield (x, y)).toVector)
      .toDF("x", "y")
  }

  test("zorderBy preserves content exactly") {
    val in = grid
    val out = Layout.zorderBy(in, Seq("x", "y"), bits = 6, numPartitions = Some(16))
    assert(out.columns.contains("zvalue"))
    val a = in.select("x", "y").collect().map(r => (r.getInt(0), r.getInt(1))).sorted
    val b = out.select("x", "y").collect().map(r => (r.getInt(0), r.getInt(1))).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("zorderBy skips files on BOTH dimensions; single-column sort only on one") {
    val n = 16
    val z = Layout.zorderBy(grid, Seq("x", "y"), bits = 6, numPartitions = Some(n))
      .drop("zvalue")
    val xSorted = grid.repartitionByRange(n, col("x")).sortWithinPartitions(col("x"))
    // per-partition [min,max] of a column — the parquet footer stats a
    // scan consults; a predicate range touches a partition iff it
    // intersects that span
    def spans(df: org.apache.spark.sql.DataFrame, colIdx: Int): Seq[(Int, Int)] =
      df.select("x", "y").rdd.mapPartitions { it =>
        val vs = it.map(_.getInt(colIdx)).toVector
        if (vs.isEmpty) Iterator.empty else Iterator((vs.min, vs.max))
      }.collect().toSeq
    def touched(spans: Seq[(Int, Int)], lo: Int, hi: Int): Int =
      spans.count { case (mn, mx) => mx >= lo && mn <= hi }
    // predicate "y in [0, 7]" (an eighth of the domain):
    val zTouchY = touched(spans(z, 1), 0, 7)
    val xTouchY = touched(spans(xSorted, 1), 0, 7)
    assert(xTouchY == n, s"x-sort cannot prune on y (touched $xTouchY of $n)")
    assert(zTouchY <= n / 2, s"z-order must prune on y: touched $zTouchY of $n")
    // predicate "x in [0, 7]": z-order still prunes most partitions
    val zTouchX = touched(spans(z, 0), 0, 7)
    assert(zTouchX <= n / 2, s"z-order must prune on x too: touched $zTouchX of $n")
  }

  test("zorderBy handles nulls, low-cardinality columns, and guards") {
    val df = Seq((Some(1), 1), (None, 2), (Some(3), 3)).toDF("x", "y")
    val out = Layout.zorderBy(df, Seq("x", "y"), bits = 4)
    assert(out.count() == 3) // nulls keep their rows (bucket 0)
    val lowCard = Seq.tabulate(100)(i => (i % 2, i)).toDF("x", "y")
    assert(Layout.zorderBy(lowCard, Seq("x", "y"), bits = 6).count() == 100)
    intercept[IllegalArgumentException](Layout.zorderBy(df, Nil))
    intercept[IllegalArgumentException](Layout.zorderBy(df, Seq("x"), bits = 9))
    intercept[IllegalArgumentException](
      Layout.zorderBy(df.withColumn("zvalue", lit(1)), Seq("x")))
  }
}
