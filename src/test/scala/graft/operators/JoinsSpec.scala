package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Join-strategy semantics: every specialized strategy must return
  * exactly the rows of the plain Catalyst join it accelerates.
  */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val left = Seq(
    ("a", 1), ("a", 2), ("b", 3), ("c", 4), ("zz", 9), (null.asInstanceOf[String], 5)
  ).toDF("k", "lv")
  private lazy val right = Seq(
    ("a", 10), ("b", 20), ("d", 40)
  ).toDF("k", "rv")

  test("hashJoin matches plain inner join") {
    assert(sortedRows(Joins.hashJoin(left, right, left("k") === right("k"))) ==
      sortedRows(left.join(right, left("k") === right("k"))))
  }

  test("sparseJoin inner on string keys matches plain join") {
    assert(sortedRows(Joins.sparseJoin(left, right, "k", 100L)) ==
      sortedRows(left.join(right, Seq("k"), "inner")))
  }

  test("sparseJoin left outer keeps Bloom-rejected rows null-padded") {
    assert(sortedRows(Joins.sparseJoin(left, right, "k", 100L, how = "left")) ==
      sortedRows(left.join(right, Seq("k"), "left")))
  }

  test("sparseJoin full outer matches plain full join") {
    assert(sortedRows(Joins.sparseJoin(left, right, "k", 100L, how = "full")) ==
      sortedRows(left.join(right, Seq("k"), "full")))
  }

  test("sparseJoin left_anti matches plain anti join") {
    assert(sortedRows(Joins.sparseJoin(left, right, "k", 100L, how = "left_anti")) ==
      sortedRows(left.join(right, Seq("k"), "left_anti")))
  }

  test("sparseJoin left_semi matches plain semi join") {
    assert(sortedRows(Joins.sparseJoin(left, right, "k", 100L, how = "left_semi")) ==
      sortedRows(left.join(right, Seq("k"), "left_semi")))
  }

  test("sparseJoin on integral keys matches plain join") {
    val l = Seq((1L, "x"), (2L, "y"), (99L, "z")).toDF("id", "lv")
    val r = Seq((1L, "p"), (3L, "q")).toDF("id", "rv")
    assert(sortedRows(Joins.sparseJoin(l, r, "id", 100L, how = "full")) ==
      sortedRows(l.join(r, Seq("id"), "full")))
  }

  test("sparseJoin rejects unsupported key types and modes") {
    val l = Seq((1.5, "x")).toDF("id", "lv")
    intercept[IllegalArgumentException](Joins.sparseJoin(l, l, "id"))
    intercept[IllegalArgumentException](Joins.sparseJoin(left, right, "k", how = "right"))
    // binary keys: Spark 4.1's bloom_filter_agg can't build over binary —
    // rejected up front with a clear message, not deep in analysis
    val b = Seq((Array[Byte](1, 2), "x")).toDF("id", "lv")
    val e = intercept[IllegalArgumentException](Joins.sparseJoin(b, b, "id"))
    assert(e.getMessage.contains("integral/string only"))
  }

  test("skewedJoinSampled rejects non-left-preserving modes before any job runs") {
    // the require must fire before the eager sample+checkpoint job
    intercept[IllegalArgumentException](
      Joins.skewedJoinSampled(left, right, Seq("k"), fanout = 4, how = "right"))
    intercept[IllegalArgumentException](
      Joins.skewedJoinSampled(left, right, Seq("k"), fanout = 4, how = "full_outer"))
  }

  test("skewedJoin inner/left match the plain join") {
    assert(sortedRows(Joins.skewedJoin(left, right, Seq("k"), fanout = 4)) ==
      sortedRows(left.join(right, Seq("k"), "inner")))
    assert(sortedRows(Joins.skewedJoin(left, right, Seq("k"), fanout = 4, how = "left")) ==
      sortedRows(left.join(right, Seq("k"), "left")))
  }

  test("skewedJoin spreads a hot key across fanout shuffle groups (and stays exact)") {
    // 50k-row left side where 90% of rows share one hot key: a plain
    // shuffle join funnels them into a single reducer group; salting
    // must spread them ~uniformly over `fanout` groups.
    val fanout = 8
    val hot = spark.range(45000).selectExpr("'hot' AS k", "id AS lv")
    val cold = spark.range(5000).selectExpr("concat('c', id % 500) AS k", "id AS lv")
    val skewedLeft = hot.union(cold)
    val dims = spark.range(501).selectExpr(
      "CASE WHEN id = 500 THEN 'hot' ELSE concat('c', id) END AS k", "id AS rv")

    // exactness on the skewed data
    assert(Joins.skewedJoin(skewedLeft, dims, Seq("k"), fanout).count() ==
      skewedLeft.join(dims, Seq("k"), "inner").count())

    // mechanism: per-(key,salt) group sizes — the shuffle unit after
    // salting — are bounded near hotCount/fanout (seeded rand(42)).
    val salted = skewedLeft.withColumn("__graft_salt", (rand(42) * fanout).cast("int"))
    val maxGroup = salted.groupBy(col("k"), col("__graft_salt"))
      .count().agg(max("count")).head().getLong(0)
    assert(maxGroup < 45000L / fanout * 3 / 2,
      s"hot key not spread: max salted group $maxGroup vs unsalted 45000")
  }

  test("skewedJoinSampled equals plain join across hot/cold splits") {
    // genuinely skewed: one key holds 90% of rows
    val hot = spark.range(20000).selectExpr("'hot' AS k", "id AS lv")
    val cold = spark.range(2000).selectExpr("concat('c', id % 200) AS k", "id AS lv")
    val skewedLeft = hot.union(cold)
    val dims = spark.range(201).selectExpr(
      "CASE WHEN id = 200 THEN 'hot' ELSE concat('c', id) END AS k", "id AS rv")
    val plainInner = sortedRows(skewedLeft.join(dims, Seq("k"), "inner"))
    val plainLeft = sortedRows(skewedLeft.join(dims, Seq("k"), "left"))
    // mid threshold: 'hot' detected hot, c* keys cold (10 rows each;
    // sampled expectation 1 < the ≥2 floor)
    assert(sortedRows(Joins.skewedJoinSampled(skewedLeft, dims, Seq("k"), fanout = 8,
      hotKeyThreshold = 1000L, sampleFraction = 0.1)) == plainInner)
    assert(sortedRows(Joins.skewedJoinSampled(skewedLeft, dims, Seq("k"), fanout = 8,
      how = "left", hotKeyThreshold = 1000L, sampleFraction = 0.1)) == plainLeft)
    // extreme thresholds: everything-cold and everything-hot paths
    assert(sortedRows(Joins.skewedJoinSampled(skewedLeft, dims, Seq("k"), fanout = 4,
      hotKeyThreshold = Long.MaxValue / 2, sampleFraction = 0.1)) == plainInner)
    assert(sortedRows(Joins.skewedJoinSampled(skewedLeft, dims, Seq("k"), fanout = 4,
      hotKeyThreshold = 1L, sampleFraction = 1.0)) == plainInner)
    // null keys stay exact (never match, survive left outer)
    assert(sortedRows(Joins.skewedJoinSampled(left, right, Seq("k"), fanout = 4,
      how = "left", hotKeyThreshold = 2L, sampleFraction = 1.0)) ==
      sortedRows(left.join(right, Seq("k"), "left")))
    // the hot branch really is detected: threshold 1000 at 10% sampling
    // expects ~2000 sampled 'hot' rows vs cut 100
    val sampled = skewedLeft.select(col("k")).sample(false, 0.1, 42L)
      .groupBy(col("k")).count().filter(col("count") >= 100)
    assert(sampled.collect().map(_.getString(0)).toSeq == Seq("hot"))
  }

  test("skewedJoinCms equals plain join; split is map-side with no broadcast probes") {
    val hot = spark.range(20000).selectExpr("'hot' AS k", "id AS lv")
    val cold = spark.range(2000).selectExpr("concat('c', id % 200) AS k", "id AS lv")
    val skewedLeft = hot.union(cold)
    val dims = spark.range(201).selectExpr(
      "CASE WHEN id = 200 THEN 'hot' ELSE concat('c', id) END AS k", "id AS rv")
    val plainInner = sortedRows(skewedLeft.join(dims, Seq("k"), "inner"))
    val plainLeft = sortedRows(skewedLeft.join(dims, Seq("k"), "left"))
    // mid threshold: 'hot' (20k rows) over, c* keys (10 rows) under
    assert(sortedRows(Joins.skewedJoinCms(skewedLeft, dims, Seq("k"), fanout = 8,
      hotKeyThreshold = 1000L)) == plainInner)
    assert(sortedRows(Joins.skewedJoinCms(skewedLeft, dims, Seq("k"), fanout = 8,
      how = "left", hotKeyThreshold = 1000L)) == plainLeft)
    // extreme thresholds: everything-cold / everything-hot paths
    assert(sortedRows(Joins.skewedJoinCms(skewedLeft, dims, Seq("k"), fanout = 4,
      hotKeyThreshold = Long.MaxValue / 2)) == plainInner)
    assert(sortedRows(Joins.skewedJoinCms(skewedLeft, dims, Seq("k"), fanout = 4,
      hotKeyThreshold = 1L)) == plainInner)
    // null keys stay exact (never match, survive left outer)
    assert(sortedRows(Joins.skewedJoinCms(left, right, Seq("k"), fanout = 4,
      how = "left", hotKeyThreshold = 2L)) ==
      sortedRows(left.join(right, Seq("k"), "left")))
    // mechanism: the classification is a codegen CMS filter, not a
    // broadcast semi/anti probe against a hot-key frame
    val plan = Joins.skewedJoinCms(skewedLeft, dims, Seq("k"), fanout = 4,
      hotKeyThreshold = 1000L).queryExecution.executedPlan.toString
    assert(plan.contains("graft_cms_estimate"))
    intercept[IllegalArgumentException](
      Joins.skewedJoinCms(left, right, Seq("k"), fanout = 4, how = "right"))
  }

  test("skewedJoin rejects right/full outer (would duplicate per salt)") {
    intercept[IllegalArgumentException](
      Joins.skewedJoin(left, right, Seq("k"), fanout = 4, how = "full_outer"))
    intercept[IllegalArgumentException](
      Joins.skewedJoin(left, right, Seq("k"), fanout = 4, how = "right"))
  }

  test("sparseLookup returns every left row with the sorted right values") {
    val out = Joins.sparseLookup(right, left, "k", "lv", expectedLeftKeys = 100L)
      .collect().map(r => (r.getString(0), r.getInt(1),
        Option(r.getSeq[Int](2)).getOrElse(Seq()))).sortBy(_._1)
    // left-of-lookup = `right` (3 rows); values looked up from `left`
    assert(out.toSeq == Seq(("a", 10, Seq(1, 2)), ("b", 20, Seq(3)), ("d", 40, Seq())))
  }

  test("sparseLookup rejects a colliding output column; outputCol overrides") {
    val collider = right.withColumn("lvs", lit(0)) // default out-col name taken
    intercept[IllegalArgumentException](
      Joins.sparseLookup(collider, left, "k", "lv", expectedLeftKeys = 100L))
    val out = Joins.sparseLookup(collider, left, "k", "lv",
        expectedLeftKeys = 100L, outputCol = Some("looked_up"))
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Int]("lvs"),
        Option(r.getSeq[Int](r.fieldIndex("looked_up"))).getOrElse(Seq()))).sortBy(_._1)
    // existing lvs column untouched; lookup lands in looked_up
    assert(out.toSeq == Seq(("a", 0, Seq(1, 2)), ("b", 0, Seq(3)), ("d", 0, Seq())))
  }

  test("sparseIntersectByKey matches plain semi join") {
    assert(sortedRows(Joins.sparseIntersectByKey(left, right, "k", 100L)) ==
      sortedRows(left.join(right.select("k"), Seq("k"), "left_semi")))
  }

  test("hashFilter matches plain semi join (and ignores right dup keys)") {
    val dupRight = right.union(right)
    assert(sortedRows(Joins.hashFilter(left, dupRight, "k")) ==
      sortedRows(left.join(right, Seq("k"), "left_semi")))
  }

  test("semiJoin/antiJoin partition left by key membership") {
    val semi = sortedRows(Joins.semiJoin(left, right, "k"))
    val anti = sortedRows(Joins.antiJoin(left, right, "k"))
    assert(semi.size + anti.size == left.count())
    assert(semi == sortedRows(left.filter(col("k").isin("a", "b"))))
  }

  test("fanoutAgg (withHotKeyFanout) equals the direct aggregation") {
    val df = left.filter(col("k").isNotNull)
    val two = Joins.fanoutAgg(df, Seq("k"), fanout = 4)(
      Seq(sum(col("lv")).as("s"), count(lit(1)).as("c")),
      Seq(sum(col("s")).as("sum_lv"), sum(col("c")).as("n")))
    val direct = df.groupBy(col("k")).agg(sum(col("lv")).as("sum_lv"), count(lit(1)).as("n"))
    assert(sortedRows(two) == sortedRows(direct))
  }

  test("cogroupN: 3-way groupWith, one sorted array per side") {
    val third = Seq(("a", 100), ("d", 200)).toDF("k", "tv")
    val out = Joins.cogroupN(
      Seq((left.filter(col("k").isNotNull), "lv"), (right, "rv"), (third, "tv")), "k")
      .collect().map(r => (r.getString(0),
        Option(r.getSeq[Int](1)).getOrElse(Seq()),
        Option(r.getSeq[Int](2)).getOrElse(Seq()),
        Option(r.getSeq[Int](3)).getOrElse(Seq()))).sortBy(_._1)
    assert(out.toSeq == Seq(
      ("a", Seq(1, 2), Seq(10), Seq(100)), ("b", Seq(3), Seq(20), Seq()),
      ("c", Seq(4), Seq(), Seq()), ("d", Seq(), Seq(40), Seq(200)),
      ("zz", Seq(9), Seq(), Seq())))
    intercept[IllegalArgumentException](Joins.cogroupN(Seq((left, "lv")), "k"))
    intercept[IllegalArgumentException]( // clashing value names → ambiguous output
      Joins.cogroupN(Seq((left, "lv"), (left, "lv")), "k"))
  }

  test("cogroupN: MultiJoin width — 6 sides, key absent from the FIRST sources still one row") {
    // 'x' appears only in sides 4 and 6: the using-column join must
    // coalesce the key forward so both land on ONE output row
    val s1 = Seq(("a", 1)).toDF("k", "v1")
    val s2 = Seq(("a", 2), ("b", 2)).toDF("k", "v2")
    val s3 = Seq(("b", 3)).toDF("k", "v3")
    val s4 = Seq(("x", 4), ("x", 44)).toDF("k", "v4")
    val s5 = Seq(("a", 5)).toDF("k", "v5")
    val s6 = Seq(("x", 6)).toDF("k", "v6")
    val out = Joins.cogroupN(
      Seq((s1, "v1"), (s2, "v2"), (s3, "v3"), (s4, "v4"), (s5, "v5"), (s6, "v6")), "k")
    assert(out.columns.toSeq == Seq("k", "v1s", "v2s", "v3s", "v4s", "v5s", "v6s"))
    val x = out.where(col("k") === "x").collect()
    assert(x.length == 1 &&
      x.head.getSeq[Int](4) == Seq(4, 44) && x.head.getSeq[Int](6) == Seq(6))
    assert(out.count() == 3) // a, b, x
    intercept[IllegalArgumentException]( // > 22 sides: MultiJoin's cap
      Joins.cogroupN((1 to 23).map(i => (s1.withColumnRenamed("v1", s"c$i"), s"c$i")), "k"))
  }

  test("cogroup groups both sides per key, full-outer") {
    val out = Joins.cogroup(left.filter(col("k").isNotNull), right, "k", "lv", "rv")
      .collect().map(r => (r.getString(0), Option(r.getSeq[Int](1)).getOrElse(Seq()),
        Option(r.getSeq[Int](2)).getOrElse(Seq()))).sortBy(_._1)
    assert(out.toSeq == Seq(
      ("a", Seq(1, 2), Seq(10)), ("b", Seq(3), Seq(20)), ("c", Seq(4), Seq()),
      ("d", Seq(), Seq(40)), ("zz", Seq(9), Seq())))
  }
}
