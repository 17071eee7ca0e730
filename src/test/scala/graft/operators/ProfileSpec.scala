package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (Some(1), Some("a")), (Some(2), None), (Some(2), Some("b")), (None, Some("a"))
  ).toDF("x", "s")

  test("profile: exact nulls, distinct, min/max per column in one pass") {
    val p = Profile.profile(df, Seq("x", "s"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(p("x") == ((4L, 1L, 2L, "1", "2")))
    assert(p("s") == ((4L, 1L, 2L, "a", "b")))
  }

  test("profileApprox: HLL distinct within the 2% rsd envelope, no Expand in the plan") {
    val big = (1 to 20000).map(i => i % 1000).toDF("x")
    val n = Profile.profileApprox(big, Seq("x")).collect()(0).getLong(3)
    assert(math.abs(n - 1000) <= 60, s"approx distinct $n vs 1000")
    val plan = Profile.profileApprox(big, Seq("x")).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile must not Expand:\n$plan")
    assert(plan.contains("partial_"), s"approx profile must partial-aggregate:\n$plan")
  }

  test("profile: guards") {
    intercept[IllegalArgumentException](Profile.profile(df, Nil))
    intercept[IllegalArgumentException](Profile.profile(df, Seq("nope")))
  }

  test("expect: one scan counts violations per contract; nulls violate") {
    import org.apache.spark.sql.functions._
    val d = Seq((Some(1), "a"), (Some(-2), "b"), (None, "a"), (Some(3), null))
      .toDF("x", "s")
    val out = Profile.expect(d, Seq(
      "x_positive" -> (col("x") > 0),
      "s_in_domain" -> col("s").isin("a", "b"),
      "x_nullable_pos" -> (col("x").isNull || col("x") > 0)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("x_positive") == ((4L, 2L, false)), "null x counts as violation")
    assert(out("s_in_domain") == ((4L, 1L, false)), "null s violates the domain")
    assert(out("x_nullable_pos") == ((4L, 1L, false)), "explicit nullable passes nulls")
    // single scan: one aggregate, no Expand, no join
    val plan = Profile.expect(d, Seq("a" -> (col("x") > 0), "b" -> col("s").isNotNull))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand") && !plan.contains("Join"), s"expect fanned out:\n$plan")
    intercept[IllegalArgumentException](Profile.expect(d, Nil))
    intercept[IllegalArgumentException](
      Profile.expect(d, Seq("dup" -> lit(true), "dup" -> lit(false))))
    // an EMPTY feed passes its contracts (0 violations, pass=true) —
    // not null counts a caller can neither pass nor fail on
    val empty = Profile.expect(d.filter(lit(false)), Seq("x_pos" -> (col("x") > 0)))
      .collect()(0)
    assert(empty.getLong(1) == 0L && empty.getLong(2) == 0L && empty.getBoolean(3))
  }

  test("violations: bounded sample of failing rows, null predicate rows included") {
    import org.apache.spark.sql.functions._
    val d = Seq((Some(1), 1), (Some(-2), 2), (None, 3), (Some(-4), 4))
      .toDF("x", "id")
    val v = Profile.violations(d, col("x") > 0).select("id").as[Int].collect().toSet
    assert(v == Set(2, 3, 4))
    assert(Profile.violations(d, col("x") > 0, limit = 2).count() == 2L)
    intercept[IllegalArgumentException](Profile.violations(d, col("x") > 0, 0))
  }

  test("correlations: one-scan pairwise Pearson matches closed forms; constant column null") {
    import org.apache.spark.sql.functions._
    val d = (1 to 50).map(i => (i.toDouble, 2.0 * i + 3, -i.toDouble, 7.0))
      .toDF("x", "y2x", "neg", "const")
    val out = Profile.correlations(d, Seq("x", "y2x", "neg", "const"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    assert(out.size == 6)
    assert(out(("x", "y2x")) == 1.0)       // exact linear
    assert(out(("x", "neg")) == -1.0)      // exact anti-linear
    assert(out(("y2x", "neg")) == -1.0)
    assert(out(("x", "const")).isNaN, "constant column must yield null corr")
    intercept[IllegalArgumentException](Profile.correlations(d, Seq("x")))
    intercept[IllegalArgumentException](Profile.correlations(d, Seq("x", "x")))
    // exactly one scan: a single partial+final aggregate pair, no join
    val p = Profile.correlations(d, Seq("x", "y2x", "neg")).queryExecution
      .executedPlan.toString
    assert(!p.contains("Join"), s"correlations planned a join:\n$p")
  }

  test("schemaDiff: added/removed/changed/unchanged; nested types by catalogString; no scan") {
    import org.apache.spark.sql.functions._
    val a = Seq((1L, "x", 1.0)).toDF("id", "name", "score")
      .withColumn("tags", array(lit("a")))
    val b = Seq((1L, 2, "y")).toDF("id", "score", "extra")
      .withColumn("tags", array(struct(lit("a").as("k"))))
    val got = Profile.schemaDiff(a, b).collect()
      .map(r => r.getString(0) -> ((r.getString(1),
        Option(r.getString(2)).orNull, Option(r.getString(3)).orNull))).toMap
    assert(got("id") == (("unchanged", "bigint", "bigint")))
    assert(got("name") == (("removed", "string", null)))
    assert(got("score") == (("changed", "double", "int")))
    assert(got("extra") == (("added", null, "string")))
    assert(got("tags")._1 == "changed") // array<string> vs array<struct<k:string>>
    assert(got("tags")._2 == "array<string>")
    // identical schemas → all unchanged; metadata only (works on an
    // unresolvable-path frame? not applicable — but no job must run)
    assert(Profile.schemaDiff(a, a).filter(col("status") =!= "unchanged").count() == 0)
  }
}
