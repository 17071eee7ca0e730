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
}
