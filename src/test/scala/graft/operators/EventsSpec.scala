package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  // (user, type, ts-minute)
  private def ev(rows: (String, String, Int)*) =
    rows.map { case (u, t, m) => (u, t, ts(m)) }.toDF("user", "type", "ts")

  test("funnelTimes: strict ordering, first-touch, null cascade") {
    val df = ev(
      ("a", "view", 0), ("a", "click", 10), ("a", "buy", 20),   // full funnel
      ("b", "view", 0), ("b", "click", 5),                      // stalls at click
      ("c", "click", 0), ("c", "view", 10), ("c", "buy", 20),   // click BEFORE view: no click after view... but buy>view ok only if click after view exists
      ("d", "buy", 0), ("d", "view", 5)                         // only view reached
    )
    val t = Events.funnelTimes(df, "user", "type", "ts", Seq("view", "click", "buy"))
      .collect().map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(t("a") == ((Some(ts(0)), Some(ts(10)), Some(ts(20)))))
    assert(t("b") == ((Some(ts(0)), Some(ts(5)), None)))
    // c: view at 10, no click strictly after 10 → stalls at view (buy needs click first)
    assert(t("c") == ((Some(ts(10)), None, None)))
    assert(t("d") == ((Some(ts(5)), None, None)))
  }

  test("funnelTimes: first-touch picks the earliest qualifying event per step") {
    val df = ev(
      ("a", "view", 2), ("a", "view", 4),
      ("a", "click", 1),                  // before the first view → not qualifying
      ("a", "click", 7), ("a", "click", 5) // earliest after view(2) is 5
    )
    val r = Events.funnelTimes(df, "user", "type", "ts", Seq("view", "click")).collect()(0)
    assert(r.getTimestamp(1) == ts(2) && r.getTimestamp(2) == ts(5))
  }

  test("funnel: horizon bounds later steps relative to step 1") {
    val df = ev(
      ("a", "view", 0), ("a", "click", 30),    // inside 1h horizon
      ("b", "view", 0), ("b", "click", 90)     // outside 1h horizon
    )
    val counts = Events.funnel(df, "user", "type", "ts", Seq("view", "click"),
      withinSec = Some(3600L)).collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(counts == Map("view" -> 2L, "click" -> 1L))
  }

  test("funnel: guards") {
    val df = ev(("a", "view", 0))
    intercept[IllegalArgumentException](Events.funnel(df, "user", "type", "ts", Nil))
    intercept[IllegalArgumentException](
      Events.funnel(df, "user", "type", "ts", Seq("view", "view")))
    intercept[IllegalArgumentException](
      Events.funnel(df, "user", "type", "ts", Seq("view"), withinSec = Some(0L)))
  }

  test("retention: period arithmetic and distinct users per period") {
    val day = 24 * 60
    val df = ev(
      ("a", "signup", 0),
      ("a", "click", 1), ("a", "click", 2),            // period 0, counted once
      ("a", "click", 8 * day),                          // period 1
      ("b", "signup", 0), ("b", "view", 20 * day),      // periods 0 (signup itself), 2
      ("c", "click", 5)                                 // never signed up → excluded
    )
    val r = Events.retention(df, "user", "type", "ts", "signup", periodDays = 7)
      .collect().map(row => (row.getString(0), row.getInt(1)) -> row.getLong(2)).toMap
    val cohortDay = Events.retention(df, "user", "type", "ts", "signup", 7)
      .collect()(0).getString(0)
    // both users signed up the same day: period 0 has both, 1 has a, 2 has b
    assert(r == Map((cohortDay, 0) -> 2L, (cohortDay, 1) -> 1L, (cohortDay, 2) -> 1L))
  }

  test("retention: events before the cohort day are ignored") {
    val df = ev(("a", "click", 0), ("a", "signup", 100), ("a", "view", 101))
    val r = Events.retention(df, "user", "type", "ts", "signup", 7).collect()
    assert(r.map(_.getLong(2)).sum == 1L) // only the post-signup activity period
  }

  test("lastTouch: most recent in-window touch, lookback bound, tie rules") {
    val df = ev(
      ("a", "view", 0), ("a", "click", 10), ("a", "buy", 15),   // click wins (latest)
      ("b", "view", 0), ("b", "buy", 200),                      // outside 60-min lookback
      ("c", "buy", 5),                                          // no touch at all
      ("d", "click", 20), ("d", "buy", 20),                     // equal-ts touch attributes
      ("e", "view", 30), ("e", "click", 30), ("e", "buy", 31)   // same-instant touches → max type
    )
    val out = Events.lastTouch(df, "user", "type", "ts",
        touchTypes = Seq("view", "click"), conversionType = "buy",
        lookbackSec = 3600L)
      .collect().map(r => r.getString(0) ->
        ((Option(r.getString(2)), Option(r.get(3))))).toMap
    assert(out("a") == ((Some("click"), Some(ts(10)))))
    assert(out("b") == ((None, None)), "touch outside the lookback must not attribute")
    assert(out("c") == ((None, None)))
    assert(out("d") == ((Some("click"), Some(ts(20)))), "equal-ts touch attributes")
    assert(out("e") == ((Some("view"), Some(ts(30)))),
      "same-instant touches collapse to the lexicographically largest type")
    intercept[IllegalArgumentException](Events.lastTouch(df, "user", "type", "ts",
      Seq("buy"), "buy", 10L))
  }

  test("attributionLinear: equal credit shares, lookback bound, no-touch conversions drop") {
    val df = ev(
      ("a", "view", 0), ("a", "click", 10), ("a", "buy", 15),   // two touches: 0.5 each
      ("b", "view", 0), ("b", "buy", 200),                      // outside 60-min lookback
      ("c", "buy", 5),                                          // no touches: no rows
      ("d", "click", 20), ("d", "buy", 20),                     // equal-ts touch counts
      ("a", "buy", 16)                                          // 2nd conversion, same 2 touches
    )
    val out = Events.attributionLinear(df, "user", "type", "ts",
        touchTypes = Seq("view", "click"), conversionType = "buy",
        lookbackSec = 3600L)
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getString(3),
        r.getLong(4), r.getDouble(5)))
    val byUser = out.groupBy(_._1)
    assert(byUser("a").length == 4) // 2 conversions x 2 touches
    assert(byUser("a").forall(t => t._4 == 2L && t._5 == 0.5))
    assert(!byUser.contains("b") && !byUser.contains("c"))
    assert(byUser("d") == Array(("d", ts(20), "click", 1L, 1.0)).toSeq ||
      byUser("d").toSeq == Seq(("d", ts(20), "click", 1L, 1.0)))
    // total credit equals the number of attributed conversions
    assert(math.abs(out.map(_._5).sum - 3.0) < 1e-12)
  }

  test("attributionTimeDecay: recency-weighted shares, exactly 1.0 per conversion") {
    val df = ev(
      // half-life 600s (10 min): touch at conv gets w=1, 10 min before w=0.5
      ("a", "view", 0), ("a", "click", 10), ("a", "buy", 10),
      ("c", "buy", 5) // no touches
    )
    val out = Events.attributionTimeDecay(df, "user", "type", "ts",
        touchTypes = Seq("view", "click"), conversionType = "buy",
        lookbackSec = 3600L, halfLifeSec = 600L)
      .collect().map(r => (r.getString(3), r.getDouble(4))).toMap
    // view: w=0.5, click: w=1.0 → credits 1/3 and 2/3
    assert(math.abs(out("view") - 1.0 / 3.0) < 1e-12)
    assert(math.abs(out("click") - 2.0 / 3.0) < 1e-12)
    assert(math.abs(out.values.sum - 1.0) < 1e-12)
  }

  test("transitions: per-user consecutive pairs, tie-ordered, cross-user isolation") {
    val df = Seq(
      ("a", "view", ts(0), 1L), ("a", "click", ts(1), 2L), ("a", "buy", ts(2), 3L),
      ("b", "view", ts(0), 4L), ("b", "view", ts(1), 5L), ("b", "click", ts(2), 6L),
      // same-instant pair for user c: event_id breaks the tie
      ("c", "click", ts(5), 8L), ("c", "view", ts(5), 7L),
      ("d", "buy", ts(9), 9L) // single event → no transition
    ).toDF("user", "type", "ts", "eid")
    val out = Events.transitions(df, "user", "ts", "type", tieCols = Seq("eid"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("view", "click") -> 3L,  // a; b's second view; c: view(7)→click(8)
      ("click", "buy") -> 1L,
      ("view", "view") -> 1L))
    // repartition-stable (the window orders totally via the tie col)
    val again = Events.transitions(df.repartition(5), "user", "ts", "type", Seq("eid"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(again == out)
  }
}
