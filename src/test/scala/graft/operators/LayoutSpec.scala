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

  /** Reference Hilbert xy→d (the classic bit-walk) for the exactness
    * cross-check of the expression-level fold.
    */
  private def hilbertRef(bits: Int, x0: Int, y0: Int): Long = {
    var (x, y, d) = (x0.toLong, y0.toLong, 0L)
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("hilbertIndex matches the reference walk on every cell of a 32x32 grid") {
    val bits = 5
    val cells = (for (x <- 0 until 32; y <- 0 until 32) yield (x, y)).toDF("x", "y")
    val got = cells
      .withColumn("h", Layout.hilbertIndex(col("x"), col("y"), bits))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    for (x <- 0 until 32; y <- 0 until 32)
      assert(got((x, y)) == hilbertRef(bits, x, y), s"cell ($x,$y)")
    // the curve visits every cell exactly once
    assert(got.values.toSeq.sorted == (0L until 1024L))
  }

  test("hilbertBy preserves content and prunes both dimensions") {
    val n = 16
    val h = Layout.hilbertBy(grid, Seq("x", "y"), bits = 6, numPartitions = Some(n))
    val a = grid.select("x", "y").collect().map(r => (r.getInt(0), r.getInt(1))).sorted
    val b = h.select("x", "y").collect().map(r => (r.getInt(0), r.getInt(1))).sorted
    assert(a.toSeq == b.toSeq)
    def spans(df: org.apache.spark.sql.DataFrame, colIdx: Int): Seq[(Int, Int)] =
      df.select("x", "y").rdd.mapPartitions { it =>
        val vs = it.map(_.getInt(colIdx)).toVector
        if (vs.isEmpty) Iterator.empty else Iterator((vs.min, vs.max))
      }.collect().toSeq
    def touched(sp: Seq[(Int, Int)], lo: Int, hi: Int): Int =
      sp.count { case (mn, mx) => mx >= lo && mn <= hi }
    val hd = h.drop("hvalue")
    assert(touched(spans(hd, 0), 0, 7) <= n / 2, "hilbert must prune on x")
    assert(touched(spans(hd, 1), 0, 7) <= n / 2, "hilbert must prune on y")
  }

  test("compactParquet merges small files to the byte budget, content intact") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val in = s"$base/small"; val out = s"$base/big"
    try {
      val df = (1 to 5000).map(i => (i.toLong, s"row $i", i % 97)).toDF("id", "s", "k")
      df.repartition(40).write.parquet(in)
      val inFiles = new java.io.File(in).listFiles().count(_.getName.endsWith(".parquet"))
      assert(inFiles == 40)
      val totalBytes = new java.io.File(in).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
      // budget = a quarter of the input → 4 output files
      val stats = Layout.compactParquet(spark, in, out,
        targetFileBytes = (totalBytes + 3) / 4, orderCols = Seq("id"))
      assert(stats.filesIn == 40L && stats.bytesIn == totalBytes)
      assert(stats.targetFiles == 4 && stats.filesOut == 4L)
      val back = spark.read.parquet(out)
      assert(sortedRows(back.select("id", "s", "k")) ==
        sortedRows(df.select("id", "s", "k")))
      // orderCols keeps the layout range-clustered: per-FILE id spans
      // disjoint (each file read alone — the footer stats a scan prunes on)
      val spans = new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".parquet")).map { f =>
          val r = spark.read.parquet(f.toString)
            .agg(min(col("id")), max(col("id"))).collect()(0)
          (r.getLong(0), r.getLong(1))
        }.sortBy(_._1)
      assert(spans.sliding(2).forall {
        case Array((_, hi), (lo, _)) => hi < lo
        case _ => true
      }, s"clustered compaction must keep disjoint id ranges: ${spans.toSeq}")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("compactParquet guards: empty input, bad budget, in-place rewrite") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact2").toString
    try {
      intercept[IllegalArgumentException](
        Layout.compactParquet(spark, s"$base/nope", s"$base/out", 1L))
      Seq((1, "a")).toDF("a", "b").write.parquet(s"$base/one")
      intercept[IllegalArgumentException](
        Layout.compactParquet(spark, s"$base/one", s"$base/one", 1L))
      // differently-spelled same dir must not slip past the guard
      intercept[IllegalArgumentException](
        Layout.compactParquet(spark, s"file://$base/one", s"$base/one", 1L))
      intercept[IllegalArgumentException](
        Layout.compactParquet(spark, s"$base/one", s"$base/x/../one", 1L))
      intercept[IllegalArgumentException](
        Layout.compactParquet(spark, s"$base/one", s"$base/out", 0L))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
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

  test("fileManifest: per-file stats cover the table; clustered ranges are disjoint") {
    val dir = java.nio.file.Files.createTempDirectory("graft_manifest").toFile
    val small = s"${dir.getAbsolutePath}/small"
    val out = s"${dir.getAbsolutePath}/t"
    val df = (1L to 2000L).map(i => (i, s"v$i")).toDF("id", "v")
    df.repartition(8).write.mode("overwrite").parquet(small)
    Layout.compactParquet(spark, small, out,
      targetFileBytes = 8L << 10, orderCols = Seq("id"))
    val m = Layout.fileManifest(spark, out, Seq("id")).collect()
    assert(m.length >= 2, s"want several files, got ${m.length}")
    assert(m.map(_.getAs[Long]("n_rows")).sum == 2000L)
    val ranges = m.map(r => (r.getAs[Long]("min_id"), r.getAs[Long]("max_id")))
      .sortBy(_._1)
    assert(ranges.forall { case (lo, hi) => lo <= hi })
    // clustered on id → per-file ranges must not overlap
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, s"overlap: $hi1 vs $lo2")
      case _ =>
    }
    intercept[IllegalArgumentException](Layout.fileManifest(spark, out, Nil))
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }
}
