package graft.examples

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class GameEvent(user: String, team: String, score: Int, ts: java.sql.Timestamp)

/** Pins each ported reference example (scio-examples) to hand-checked
  * outputs on the originals' own fixture shapes.
  */
class ExamplesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("wordCount: the classic — tokenize, drop empties, count") {
    val lines = Seq("Hello world hello", "  hello, it's me ").toDF("value")
    val out = Examples.wordCount(lines).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("Hello" -> 1L, "world" -> 1L, "hello" -> 2L, "it's" -> 1L, "me" -> 1L))
  }

  test("debuggingWordCount: regex filter plus matched/unmatched counters") {
    val lines = Seq("Flourish flourish stomach", "nothing else matters").toDF("value")
    val out = Examples.debuggingWordCount(lines, "Flourish|stomach")
    val rows = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("Flourish" -> 1L, "stomach" -> 1L))
    val m = out.queryExecution.observedMetrics("debug_wc")
    assert(m.getAs[Long]("matched_words") == 2L)
    assert(m.getAs[Long]("unmatched_words") == 4L) // flourish, nothing, else, matters
  }

  test("windowedWordCount: per fixed window counts") {
    val lines = Seq(
      (ts("2024-01-01 10:05:00"), "a b a"),
      (ts("2024-01-01 10:40:00"), "a")).toDF("ts", "text")
    val out = Examples.windowedWordCount(lines, "ts", "text", "30 minutes")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
    assert(out == Set(
      ("2024-01-01 10:00:00.0", "a", 2L), ("2024-01-01 10:00:00.0", "b", 1L),
      ("2024-01-01 10:30:00.0", "a", 1L)))
  }

  test("autoComplete: top-k per prefix, count desc, deterministic ties") {
    val input = Seq("apple", "apple", "apply", "ape", "banana").toDF("q")
    val out = Examples.autoComplete(input, "q", k = 2)
    val ap = out.filter(col("prefix") === "ap").orderBy(col("rank"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(ap == Seq(("apple", 2L), ("ape", 1L))) // ape beats apply on word tiebreak
    val apl = out.filter(col("prefix") === "appl").orderBy(col("rank"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(apl == Seq(("apple", 2L), ("apply", 1L)))
    // every word is its own full-length prefix
    assert(out.filter(col("prefix") === "banana").count() == 1)
  }

  test("topWikipediaSessions: gap sessionization, top session per month of session end") {
    val edits = Seq(
      // user1: one long session (3 edits), Jan
      ("user1", ts("2024-01-10 10:00:00")), ("user1", ts("2024-01-10 10:30:00")),
      ("user1", ts("2024-01-10 11:00:00")),
      // user2: two sessions (2 edits, 1 edit), Jan
      ("user2", ts("2024-01-05 08:00:00")), ("user2", ts("2024-01-05 08:10:00")),
      ("user2", ts("2024-01-20 22:00:00")),
      // user2 in Feb: 2 edits
      ("user2", ts("2024-02-01 09:00:00")), ("user2", ts("2024-02-01 09:20:00"))
    ).toDF("user", "ts")
    val out = Examples.topWikipediaSessions(edits, "user", "ts", "1 hour")
      .collect().map(r => (r.getTimestamp(0).toString.take(7), r.getString(2), r.getLong(3))).toSet
    assert(out == Set(("2024-01", "user1", 3L), ("2024-02", "user2", 2L)))
  }

  test("game: userScore, hourlyTeamScore, spammyUsers, gameStats filter") {
    val events = Seq(
      ("bot", "red", 1000, ts("2024-01-01 10:05:00")),
      ("bot", "red", 1000, ts("2024-01-01 10:06:00")),
      ("amy", "red", 10, ts("2024-01-01 10:10:00")),
      ("bob", "blue", 20, ts("2024-01-01 11:10:00")),
      ("cal", "blue", 30, ts("2024-01-01 11:50:00"))
    ).toDF("user", "team", "score", "ts")
    val totals = Examples.userScore(events, "user", "score").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(totals == Map("bot" -> 2000L, "amy" -> 10L, "bob" -> 20L, "cal" -> 30L))
    // global mean of totals = 515; 2.5x = 1287.5 — only the bot exceeds it
    val spam = Examples.spammyUsers(events, "user", "score").collect().map(_.getString(0)).toSeq
    assert(spam == Seq("bot"))
    val team = Examples.gameStatsTeamScores(events, "user", "team", "score", "ts")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
    assert(team == Set( // bot's 2000 excluded from red's 10:00 window
      ("2024-01-01 10:00:00.0", "red", 10L),
      ("2024-01-01 11:00:00.0", "blue", 50L)))
    val hourly = Examples.hourlyTeamScore(events, "team", "score", "ts",
      startMin = Some("2024-01-01 10:30:00"), stopMin = None)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    assert(hourly == Set(("blue", 50L))) // red's events all before startMin
  }

  test("avgSessionLength: session minutes averaged per activity window") {
    val events = Seq(
      ("u1", ts("2024-01-01 10:00:00")), ("u1", ts("2024-01-01 10:04:00")), // 4+gap min session
      ("u2", ts("2024-01-01 10:02:00")) // point session
    ).toDF("user", "ts")
    val out = Examples.avgSessionLength(events, "user", "ts",
      sessionGap = "5 minutes", activityWindow = "30 minutes")
      .collect().map(r => (r.getTimestamp(0).toString, r.getDouble(1)))
    // u1 session: 10:00→10:09 (end = last+gap) = 9 min; u2: 10:02→10:07 = 5 min
    assert(out.toSeq == Seq(("2024-01-01 10:00:00.0", 7.0)))
  }

  test("cookbook: filter below global mean, left join with 'none', max per key, combinePerKey") {
    val readings = Seq((2020L, 7L, 1L, 10.0), (2020L, 7L, 2L, 30.0), (2020L, 8L, 1L, 20.0))
      .toDF("year", "month", "day", "mean_temp")
    val below = Examples.filterBelowGlobalMean(readings, "month", "mean_temp", 7)
      .collect().map(_.getDouble(3)).toSeq
    assert(below == Seq(10.0)) // global mean 20; July rows below it
    val mx = Examples.maxPerKey(readings, "month", "mean_temp")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(mx == Map(7L -> 30.0, 8L -> 20.0))

    val ev = Seq(("SE", "midsummer"), ("XX", "unknown place")).toDF("country_code", "event_info")
    val cc = Seq(("SE", "Sweden")).toDF("country_code", "country_name")
    val joined = Examples.joinExamples(ev, cc)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(joined == Set(("SE", "Sweden"), ("XX", "none")))

    val wp = Seq(("abandonment", "hamlet"), ("abandonment", "macbeth"),
      ("abandonment", "hamlet"), ("short", "hamlet")).toDF("word", "corpus")
    val cpk = Examples.combinePerKey(wp, "word", "corpus").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(cpk == Seq(("abandonment", "hamlet,macbeth")))
  }

  test("trafficMaxLaneFlow: argmax lane per station per sliding window") {
    val r = Seq(
      ("s1", "lane1", 50, 60.0, ts("2024-01-01 10:02:00")),
      ("s1", "lane2", 80, 55.0, ts("2024-01-01 10:03:00")),
      ("s2", "lane1", 10, 70.0, ts("2024-01-01 10:04:00"))
    ).toDF("station", "lane", "flow", "speed", "ts")
    val out = Examples.trafficMaxLaneFlow(r, "station", "lane", "flow", "speed", "ts",
      duration = "10 minutes", slide = "10 minutes")
      .collect().map(x => (x.getString(1), x.getInt(2), x.getString(3))).toSet
    assert(out == Set(("s1", 80, "lane2"), ("s2", 10, "lane1")))
  }

  test("trafficRoutes: per-station consecutive comparisons, slowdown flag, faithful 0>=0 edge") {
    val r = Seq(
      // route A, station s1: 60 -> 50 -> 40 (2 slowdowns), s2: 30 -> 35 (1 speedup)
      ("A", "s1", 60.0, ts("2024-01-01 10:00:10")),
      ("A", "s1", 50.0, ts("2024-01-01 10:00:40")),
      ("A", "s1", 40.0, ts("2024-01-01 10:01:20")),
      ("A", "s2", 30.0, ts("2024-01-01 10:00:20")),
      ("A", "s2", 35.0, ts("2024-01-01 10:01:40")),
      // route B: single reading — no pairs, reference flags TRUE
      ("B", "s9", 70.0, ts("2024-01-01 10:00:30"))
    ).toDF("route", "station", "speed", "ts")
    val out = Examples.trafficRoutes(r, "route", "station", "speed", "ts",
      duration = "3 minutes", slide = "3 minutes") // tumbling: one window
      .collect().map(x => (x.getString(1), math.rint(x.getDouble(2) * 100) / 100, x.getBoolean(3))).toSet
    // A: avg (60+50+40+30+35)/5 = 43; slowdowns 2 >= 2*1 speedup -> true
    assert(out == Set(("A", 43.0, true), ("B", 70.0, true)))
    // richer window where speedups dominate -> false
    val r2 = Seq(
      ("A", "s1", 10.0, ts("2024-01-01 10:00:10")),
      ("A", "s1", 20.0, ts("2024-01-01 10:00:40")),
      ("A", "s1", 30.0, ts("2024-01-01 10:01:20"))).toDF("route", "station", "speed", "ts")
    val o2 = Examples.trafficRoutes(r2, "route", "station", "speed", "ts",
      duration = "3 minutes", slide = "3 minutes").collect()
    assert(o2.length == 1 && !o2.head.getBoolean(3)) // 0 slowdowns < 2*2 speedups
  }

  test("leaderBoard: streaming team scores equal the batch answer; user totals run globally") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[GameEvent]
    val events = Seq(
      GameEvent("amy", "red", 10, ts("2024-01-01 10:05:00")),
      GameEvent("bob", "red", 5, ts("2024-01-01 10:50:00")),
      GameEvent("amy", "blue", 7, ts("2024-01-01 11:05:00")),
      // late-but-within-watermark arrival for the 10:00 window
      GameEvent("cal", "red", 3, ts("2024-01-01 10:59:00")))
    input.addData(events: _*)
    val q = Examples.leaderBoardTeamScores(input.toDF(), "team", "score", "ts")
      .writeStream.format("memory").queryName("lb_team").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("lb_team")
    val batch = Examples.leaderBoardTeamScores(events.toDF(), "team", "score", "ts")
    assert(sortedRows(streamed) == sortedRows(batch))
    assert(streamed.count() == 2) // (10:00 red), (11:00 blue)

    val users = Examples.leaderBoardUserScores(events.toDF(), "user", "score")
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(users == Map("amy" -> 17L, "bob" -> 5L, "cal" -> 3L))
  }

  test("tfIdf and distinctExample delegate faithfully") {
    val docs = Seq(("d1", "a a b"), ("d2", "b c")).toDF("id", "text")
    val tf = Examples.tfIdf(docs, "id", "text")
    assert(tf.columns.toSeq == Seq("term", "doc", "tfidf") && tf.count() == 4)
    assert(Examples.distinctExample(Seq(1, 1, 2).toDF("v")).count() == 2)
  }
}
