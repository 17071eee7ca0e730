package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins rollupAndCount to the reference's RollupTest fixtures
  * (scio-extra rollup/RollupTest.scala) on the typed path, then
  * cross-checks the columnar path against a brute-force
  * COUNT(DISTINCT) over the same grouping sets — including the
  * duplicate-(key, dims, rollup) input the reference never tests.
  */
object RollupSpec {
  // RollupTest fixtures: rollup generators live outside the suite so
  // the closures Spark serializes don't capture the scalatest engine
  val rollup1d: Option[String] => Set[Option[String]] = p => Set(p, None)
  val rollup2d: ((Option[String], Option[String])) => Set[(Option[String], Option[String])] =
    r => (for {
      p <- List(None, r._1)
      o <- List(None, r._2)
    } yield (p, o)).toSet
  val sumLong: (Long, Long) => Long = _ + _
}

class RollupSpec extends SparkSpec {
  import spark.implicits._
  import RollupSpec._

  // (user, (date, country), Option(platform), ms)
  private def typed1d(input: Seq[(String, (String, String), Option[String], Long)]) =
    Rollup.rollupAndCount(input.toDS())(rollup1d)(0L, sumLong)
      .collect().toSet

  test("reference fixture: no double-count across rollup dimension values") {
    val out = typed1d(Seq(
      ("user1", ("2020-01-01", "se"), Some("web"), 100L),
      ("user1", ("2020-01-01", "se"), Some("mobile"), 200L)))
    assert(out == Set(
      ((("2020-01-01", "se"), Some("web")), (100L, 1L)),
      ((("2020-01-01", "se"), Some("mobile")), (200L, 1L)),
      ((("2020-01-01", "se"), None), (300L, 1L))))
  }

  test("reference fixture: distinct users sum at the top level") {
    val out = typed1d(Seq(
      ("user1", ("2020-01-01", "se"), Some("web"), 100L),
      ("user1", ("2020-01-01", "se"), Some("mobile"), 200L),
      ("user2", ("2020-01-01", "se"), Some("speaker"), 200L)))
    assert(out(((("2020-01-01", "se"), None), (500L, 2L))))
    assert(out(((("2020-01-01", "se"), Some("web")), (100L, 1L))))
  }

  test("reference fixture: fixed dimensions separate; empty input is empty") {
    val out = typed1d(Seq(
      ("user1", ("2020-01-01", "se"), Some("web"), 100L),
      ("user1", ("2020-01-01", "se"), Some("mobile"), 200L),
      ("user2", ("2020-01-02", "se"), Some("speaker"), 200L)))
    assert(out(((("2020-01-01", "se"), None), (300L, 1L))))
    assert(out(((("2020-01-02", "se"), None), (200L, 1L))))
    assert(typed1d(Seq.empty).isEmpty)
  }

  test("reference fixture: 2-D hierarchy sums on matching rolled dims") {
    // RollupTest's RollupDims2D case, flattened to a (p, os) tuple
    val input = Seq(
      ("user1", "d1", (Option("web"), Option("linux")), 100L),
      ("user1", "d1", (Option("android"), Option("linux")), 200L),
      ("user2", "d1", (Option("android"), Option("ios")), 200L))
    val out = Rollup.rollupAndCount(input.toDS())(rollup2d)(0L, sumLong).collect().toSet
    assert(out(("d1", (None: Option[String], None: Option[String])), (500L, 2L)))
    assert(out(("d1", (Option("android"), None: Option[String])), (400L, 2L)))
    assert(out(("d1", (Option("android"), Option("linux"))), (200L, 1L)))
  }

  test("columnar path matches brute-force COUNT(DISTINCT) per grouping set") {
    // duplicated (key, dims, rollup) rows included: measure sums over
    // ALL rows, distinct_count stays exact even at the leaf level
    val df = Seq(
      (1L, "A", "s1", 2020L, 10.0),
      (1L, "A", "s1", 2020L, 5.0), // duplicate leaf for user 1
      (1L, "A", "s2", 2020L, 7.0),
      (2L, "A", "s1", 2021L, 1.0),
      (2L, "B", "s1", 2020L, 2.0),
      (3L, "B", "s2", 2021L, 4.0)
    ).toDF("u", "fixed", "st", "yr", "m")
    val sets = Seq(Seq("st", "yr"), Seq("st"), Seq("yr"), Seq.empty)
    val got = Rollup.rollupAndCount(df, "u", Seq("fixed"), Seq("st", "yr"), sets, "m")
    val expected = sets.map { keep =>
      val gcols = "fixed" +: keep
      df.groupBy(gcols.map(col): _*)
        .agg(sum(col("m")).as("measure_sum"),
          countDistinct(col("u")).as("distinct_count"))
        .select(col("fixed"),
          (if (keep.contains("st")) col("st") else lit(null).cast("string")).as("st"),
          (if (keep.contains("yr")) col("yr") else lit(null).cast("long")).as("yr"),
          col("measure_sum"), col("distinct_count"))
    }.reduce(_ unionAll _)
    assert(sortedRows(got) == sortedRows(expected))
    // spot values: leaf (A,s1,2020) has ONE distinct user over 2 rows
    val leaf = got.where(col("fixed") === "A" && col("st") === "s1" && col("yr") === 2020)
      .select("measure_sum", "distinct_count").collect().head
    assert(leaf.getDouble(0) == 15.0 && leaf.getLong(1) == 1L)
    val top = got.where(col("fixed") === "A" && col("st").isNull && col("yr").isNull)
      .select("measure_sum", "distinct_count").collect().head
    assert(top.getDouble(0) == 23.0 && top.getLong(1) == 2L)
  }

  test("columnar path keeps a genuine NULL dim value distinct from rolled-up") {
    // user 1/2 have st = NULL as a DATA value; keep{st,yr} must not
    // collapse into keep{yr} for them (the GROUPING() bit the
    // __keep_mask struct field carries — without it the leaf rows
    // silently merge into the subtotal and distinct_count diverges
    // from SQL GROUPING SETS)
    val df = Seq(
      (1L, "A", Option.empty[String], 2020L, 10.0),
      (2L, "A", Option.empty[String], 2020L, 5.0),
      (2L, "A", Option("s1"), 2020L, 7.0),
      (3L, "A", Option("s1"), 2021L, 1.0)
    ).toDF("u", "fixed", "st", "yr", "m")
    val sets = Seq(Seq("st", "yr"), Seq("yr"))
    val got = Rollup.rollupAndCount(df, "u", Seq("fixed"), Seq("st", "yr"), sets, "m")
    val expected = sets.map { keep =>
      val gcols = "fixed" +: keep
      df.groupBy(gcols.map(col): _*)
        .agg(sum(col("m")).as("measure_sum"),
          countDistinct(col("u")).as("distinct_count"))
        .select(col("fixed"),
          (if (keep.contains("st")) col("st") else lit(null).cast("string")).as("st"),
          (if (keep.contains("yr")) col("yr") else lit(null).cast("long")).as("yr"),
          col("measure_sum"), col("distinct_count"))
    }.reduce(_ unionAll _)
    assert(sortedRows(got) == sortedRows(expected))
    // both the NULL-leaf and the {yr}-subtotal rows exist for yr=2020,
    // st NULL — distinguishable by their aggregates, never merged
    val at2020 = got.where(col("yr") === 2020 && col("st").isNull)
      .select("measure_sum", "distinct_count").collect()
      .map(r => (r.getDouble(0), r.getLong(1))).toSet
    assert(at2020 == Set((15.0, 2L), (22.0, 2L)))
  }

  test("columnar path validates grouping sets") {
    val df = Seq((1L, "A", "x", 1.0)).toDF("u", "fixed", "st", "m")
    intercept[IllegalArgumentException] {
      Rollup.rollupAndCount(df, "u", Seq("fixed"), Seq("st"), Seq(Seq("nope")), "m")
    }
    intercept[IllegalArgumentException] {
      Rollup.rollupAndCount(df, "u", Seq("fixed"), Seq("st"), Seq.empty, "m")
    }
  }
}
