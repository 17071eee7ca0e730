package graft.operators

import graft.SparkSpec

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("kaplanMeier: textbook product-limit curve with censoring") {
    // durations: 1(event), 2(censored), 3(event), 3(event), 4(censored), 5(event)
    val subj = Seq(
      (1L, true), (2L, false), (3L, true), (3L, true), (4L, false), (5L, true)
    ).toDF("dur", "ev")
    val out = Survival.kaplanMeier(subj, "dur", "ev")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // t=1: n=6 d=1 → S = 5/6
    // t=2: n=5 d=0 c=1 → S unchanged 5/6
    // t=3: n=4 d=2 → S = 5/6 · 2/4 = 5/12
    // t=4: n=2 d=0 c=1 → unchanged
    // t=5: n=1 d=1 → S = 0 (everyone left dies)
    assert(out(1L)._1 == 6L && out(1L)._2 == 1L)
    assert(math.abs(out(1L)._4 - 5.0 / 6.0) < 1e-9)
    assert(out(2L) == ((5L, 0L, 1L, out(2L)._4)) && math.abs(out(2L)._4 - 5.0 / 6.0) < 1e-9)
    assert(out(3L)._1 == 4L && out(3L)._2 == 2L)
    assert(math.abs(out(3L)._4 - 5.0 / 12.0) < 1e-9)
    assert(math.abs(out(4L)._4 - 5.0 / 12.0) < 1e-9)
    assert(out(5L) == ((1L, 1L, 0L, 0.0)))
    // Nelson–Aalen hazard at t=3: 1/6 + 0 + 2/4
    val h = Survival.kaplanMeier(subj, "dur", "ev")
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(math.abs(h(3L) - (1.0 / 6.0 + 2.0 / 4.0)) < 1e-9)
    assert(math.abs(h(5L) - (1.0 / 6.0 + 2.0 / 4.0 + 1.0)) < 1e-9)
  }

  test("kaplanMeier: all-censored curve stays at 1.0; null durations drop") {
    val subj = Seq((Some(1L), false), (Some(2L), false), (None, true))
      .toDF("dur", "ev")
    val out = Survival.kaplanMeier(subj, "dur", "ev").collect()
    assert(out.length == 2)
    assert(out.forall(_.getDouble(4) == 1.0))
  }
}
