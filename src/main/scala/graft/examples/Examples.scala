package graft.examples

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's canonical example pipelines (scio-examples
  * src/main/scala/com/spotify/scio/examples — the classic
  * Beam/Dataflow demo set), re-expressed Spark-first. These are the
  * pipelines a reference user writes on day one; having each one as a
  * one-call function (plus ExamplesSpec pinning its output) is the
  * switch-evidence for "every query they run today runs here".
  *
  * Cloud-only surfaces in the originals (BigQuery tables, Pub/Sub
  * topics, Datastore entities) become DataFrame inputs/outputs — the
  * pipeline LOGIC between read and write is what each function keeps,
  * faithfully. Every function is a declarative plan (codegen
  * projections, partial aggregates, window ranks); none collects to
  * the driver except the documented 1-row global means, which ride
  * back as broadcast crossJoins exactly like the reference's
  * `.cross(mean)` side input.
  */
object Examples {

  /** MinimalWordCount.scala / WordCount.scala: tokenize on
    * non-alpha (the reference's `[^a-zA-Z']+`), drop empties, count
    * per word. Output (word, n).
    */
  def wordCount(lines: DataFrame, textCol: String = "value"): DataFrame =
    lines
      .select(explode(split(trim(col(textCol)), "[^a-zA-Z']+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** DebuggingWordCount.scala: word counts filtered to a regex, with
    * the matched/unmatched counters the original tracks as Beam
    * metrics. Counters ride as an `observe` on the returned frame —
    * read them from the QueryExecutionListener / observed metrics map
    * under "debug_wc" (matched_words, unmatched_words).
    */
  def debuggingWordCount(lines: DataFrame, filterRegex: String,
                         textCol: String = "value"): DataFrame = {
    val counts = wordCount(lines, textCol)
      .withColumn("__m", col("word").rlike(filterRegex))
    counts
      .observe("debug_wc",
        sum(when(col("__m"), 1L).otherwise(0L)).as("matched_words"),
        sum(when(!col("__m"), 1L).otherwise(0L)).as("unmatched_words"))
      .filter(col("__m")).drop("__m")
  }

  /** WindowedWordCount.scala: fixed event-time windows over
    * timestamped lines, word counts per window. Output
    * (window_start, word, n).
    */
  def windowedWordCount(lines: DataFrame, tsCol: String, textCol: String,
                        duration: String): DataFrame =
    lines
      .select(col(tsCol), explode(split(trim(col(textCol)), "[^a-zA-Z']+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(window(col(tsCol), duration), col("word"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("word"), col("n"))

  /** complete/AutoComplete.scala computeTopFlat: top-k most frequent
    * completions per prefix (length >= minPrefix). The reference fans
    * each (word, count) out to its prefixes and runs `topByKey`; here
    * the fan-out is a codegen `explode(transform(sequence(...)))` and
    * the top-k is a window rank — which Catalyst executes as
    * WindowGroupLimit (rank pushed below the shuffle), the same
    * per-key-bounded shape. Output (prefix, word, n, rank).
    *
    * The original's `computeTopRecursive` variant is a Beam-side
    * OPTIMIZATION (top-k of prefix p from the top-k's of its
    * children), not different semantics — its output equals the flat
    * form's. Under Spark the rank-below-shuffle WindowGroupLimit
    * already bounds per-key work, so the flat plan IS the scale path.
    */
  def autoComplete(input: DataFrame, textCol: String, k: Int,
                   minPrefix: Int = 1): DataFrame = {
    require(k >= 1 && minPrefix >= 1, s"need k >= 1 and minPrefix >= 1, got k=$k minPrefix=$minPrefix")
    val counts = input
      .filter(length(col(textCol)) >= minPrefix)
      .groupBy(col(textCol).as("word")).agg(count(lit(1)).as("n"))
    val pre = counts.select(
      explode(transform(sequence(lit(minPrefix), length(col("word"))),
        i => substring(col("word"), lit(1), i).as("p"))).as("prefix"),
      col("word"), col("n"))
    val w = Window.partitionBy(col("prefix"))
      .orderBy(col("n").desc, col("word").asc) // count desc, word tiebreak: deterministic
    pre.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** complete/TopWikipediaSessions.scala: sessionize edits per user
    * (gap-based), count edits per session, then the top session per
    * calendar month of the session END (Beam assigns the post-GBK
    * element the window end timestamp). Sampling in the original is
    * a throughput knob, not semantics — callers sample upstream.
    * Output (month, user, session_start, n_edits).
    */
  def topWikipediaSessions(edits: DataFrame, userCol: String, tsCol: String,
                           gap: String = "1 hour", topPerMonth: Int = 1): DataFrame = {
    val sessions = edits
      .groupBy(session_window(col(tsCol), gap), col(userCol).as("user"))
      .agg(count(lit(1)).as("n_edits"))
      .select(date_trunc("month", col("session_window.end")).as("month"),
        col("session_window.start").as("session_start"), col("user"), col("n_edits"))
    val w = Window.partitionBy(col("month"))
      .orderBy(col("n_edits").desc, col("user").asc, col("session_start").asc)
    sessions.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topPerMonth).drop("rank")
  }

  /** complete/TfIdf.scala: (term, doc, tf·idf) over a (doc, text)
    * corpus — delegates to the engine's Tfidf kernel (same shuffle
    * shape as the reference's three-way join of term/doc/total
    * counts).
    */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.functions.Tfidf.termDoc(docs, idCol, textCol)
      .select(col("term"), col("id").as("doc"), col("tfidf"))

  /** complete/game/UserScore.scala: total score per user. */
  def userScore(events: DataFrame, userCol: String, scoreCol: String): DataFrame =
    events.groupBy(col(userCol).as("user"))
      .agg(sum(col(scoreCol)).as("total_score"))

  /** complete/game/HourlyTeamScore.scala: per-team totals in fixed
    * windows, events outside [startMin, stopMin) dropped — the
    * original's window filter on event time. Output
    * (window_start, team, total_score).
    */
  def hourlyTeamScore(events: DataFrame, teamCol: String, scoreCol: String,
                      tsCol: String, duration: String = "1 hour",
                      startMin: Option[String] = None,
                      stopMin: Option[String] = None): DataFrame = {
    val bounded = (startMin, stopMin) match {
      case (a, b) =>
        val afterStart = a.map(s => col(tsCol) >= lit(s).cast("timestamp")).getOrElse(lit(true))
        val beforeStop = b.map(s => col(tsCol) < lit(s).cast("timestamp")).getOrElse(lit(true))
        events.filter(afterStart && beforeStop)
    }
    bounded
      .groupBy(window(col(tsCol), duration), col(teamCol).as("team"))
      .agg(sum(col(scoreCol)).as("total_score"))
      .select(col("window.start").as("window_start"), col("team"), col("total_score"))
  }

  /** complete/game/GameStats.scala calculateSpammyUsers: users whose
    * total score exceeds 2.5× the global mean of user totals. The
    * global mean is the reference's `.cross(mean)` side input — here
    * a broadcast 1-row crossJoin, never a driver collect of the data.
    */
  def spammyUsers(events: DataFrame, userCol: String, scoreCol: String,
                  multiplier: Double = 2.5): DataFrame = {
    val totals = userScore(events, userCol, scoreCol)
    val mean = totals.agg(avg(col("total_score")).as("__gm"))
    totals.crossJoin(broadcast(mean))
      .filter(col("total_score") > col("__gm") * multiplier)
      .select(col("user"), col("total_score"))
  }

  /** complete/game/GameStats.scala team-score arm: fixed-window team
    * totals EXCLUDING spammy users' events (the original's map side
    * input filter → a broadcast anti-join, the at-scale equivalent).
    */
  def gameStatsTeamScores(events: DataFrame, userCol: String, teamCol: String,
                          scoreCol: String, tsCol: String,
                          duration: String = "1 hour"): DataFrame = {
    val spam = spammyUsers(events, userCol, scoreCol).select(col("user"))
    events
      .join(broadcast(spam), events(userCol) === spam("user"), "left_anti")
      .groupBy(window(col(tsCol), duration), col(teamCol).as("team"))
      .agg(sum(col(scoreCol)).as("total_score"))
      .select(col("window.start").as("window_start"), col("team"), col("total_score"))
  }

  /** complete/game/GameStats.scala session arm: mean user-session
    * length (minutes) per fixed window of session starts. Session
    * windows per user, duration from the merged window bounds —
    * Spark's session_window returns exactly those bounds.
    */
  def avgSessionLength(events: DataFrame, userCol: String, tsCol: String,
                       sessionGap: String = "5 minutes",
                       activityWindow: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col(tsCol), sessionGap), col(userCol))
      .agg(count(lit(1)).as("__n"))
      .select(col("session_window.start").as("s"),
        ((unix_timestamp(col("session_window.end")) -
          unix_timestamp(col("session_window.start"))) / 60.0).as("mins"))
      .groupBy(window(col("s"), activityWindow))
      .agg(avg(col("mins")).as("mean_session_minutes"))
      .select(col("window.start").as("window_start"), col("mean_session_minutes"))

  /** cookbook/FilterExamples.scala: readings for `monthFilter` whose
    * mean_temp is below the GLOBAL mean — global mean via broadcast
    * crossJoin (the reference's `.cross(globalMeanTemp)`).
    */
  def filterBelowGlobalMean(readings: DataFrame, monthCol: String,
                            tempCol: String, monthFilter: Int): DataFrame = {
    val mean = readings.agg(avg(col(tempCol)).as("__gm"))
    readings.filter(col(monthCol) === monthFilter)
      .crossJoin(broadcast(mean))
      .filter(col(tempCol) < col("__gm"))
      .drop("__gm")
  }

  /** cookbook/JoinExamples.scala: events left-joined to country names
    * by code, absent names as "none" (the original's
    * `countryNameOpt.getOrElse("none")`).
    */
  def joinExamples(events: DataFrame, countries: DataFrame): DataFrame =
    events
      .join(broadcast(countries), Seq("country_code"), "left")
      .select(col("country_code"),
        coalesce(col("country_name"), lit("none")).as("country_name"),
        col("event_info"))

  /** cookbook/MaxPerKeyExamples.scala: max mean_temp per month. */
  def maxPerKey(readings: DataFrame, monthCol: String, tempCol: String): DataFrame =
    readings.groupBy(col(monthCol).as("month"))
      .agg(max(col(tempCol)).as("max_mean_temp"))

  /** cookbook/CombinePerKeyExamples.scala: for words longer than
    * `minWordLength`, the sorted, comma-joined set of plays each word
    * appears in — the reference's `aggregateByKey(SortedSet)(...)`
    * as a distinct + sorted collect_set aggregate.
    */
  def combinePerKey(wordPlays: DataFrame, wordCol: String, playCol: String,
                    minWordLength: Int = 9): DataFrame =
    wordPlays
      .filter(length(col(wordCol)) > minWordLength)
      .select(col(wordCol).as("word"), col(playCol).as("play")).distinct()
      .groupBy(col("word"))
      .agg(array_join(sort_array(collect_set(col("play"))), ",").as("all_plays"))

  /** cookbook/DistinctExample.scala — distinct rows (scio
    * `.distinct`); kept for the example-inventory's completeness.
    */
  def distinctExample(df: DataFrame): DataFrame = df.distinct()

  /** complete/TrafficMaxLaneFlow.scala: per station, over sliding
    * windows, the lane reading with MAX flow (full reading carried —
    * the reference keeps the whole LaneInfo via Top(1)). max_by over
    * a struct gives the same single-pass argmax; ties break toward
    * the lexicographically greatest struct, made deterministic by
    * putting (flow, lane) first. Output one row per
    * (window_start, station) with the argmax lane's fields.
    */
  /** complete/TrafficRoutes.scala: per route, per sliding window —
    * mean speed plus the original's slowdown detector: order each
    * station's readings by time, compare consecutive pairs
    * (prev < cur = speedup, prev >= cur = slowdown), and flag the
    * window when slowdowns >= 2× speedups (NOTE: a window with no
    * consecutive pairs flags TRUE — 0 >= 0 — which is the reference's
    * own behavior, kept faithfully). The per-station ordered fold is
    * an `aggregate` HOF over the sorted in-window readings (struct
    * state: prev speed + both counters) — no UDF, one shuffle to the
    * (window, route, station) grain, then a tiny re-group to routes.
    * Ties on timestamp order deterministically by (ts, speed) —
    * stricter than the reference's arbitrary-under-shuffle sortBy.
    */
  def trafficRoutes(readings: DataFrame, routeCol: String, stationCol: String,
                    speedCol: String, tsCol: String,
                    duration: String = "3 minutes", slide: String = "1 minute"): DataFrame = {
    val perStation = readings
      .groupBy(window(col(tsCol), duration, slide), col(routeCol).as("route"),
        col(stationCol).as("station"))
      .agg(sort_array(collect_list(struct(col(tsCol).as("ts"),
          col(speedCol).cast("double").as("speed")))).as("rs"),
        sum(col(speedCol)).as("ssum"), count(lit(1)).as("scnt"))
    val zero = struct(lit(Double.NaN).as("prev"), lit(0L).as("ups"), lit(0L).as("downs"))
    val folded = perStation.withColumn("st",
      aggregate(col("rs"), zero, (acc, x) => {
        val prev = acc.getField("prev")
        val sp = x.getField("speed")
        struct(sp.as("prev"),
          (acc.getField("ups") + when(!isnan(prev) && prev < sp, 1L).otherwise(0L)).as("ups"),
          (acc.getField("downs") + when(!isnan(prev) && prev >= sp, 1L).otherwise(0L)).as("downs"))
      }))
    folded
      .groupBy(col("window"), col("route"))
      .agg((sum(col("ssum")) / sum(col("scnt"))).as("avg_speed"),
        sum(col("st.ups")).as("ups"), sum(col("st.downs")).as("downs"))
      .select(col("window.start").as("window_start"), col("route"), col("avg_speed"),
        (col("downs") >= col("ups") * 2).as("slowdown_event"))
  }

  /** complete/game/LeaderBoard.scala team arm: fixed-window team
    * totals on an UNBOUNDED input with late data honored up to the
    * watermark — Beam's allowedLateness + trigger refinements map to
    * the watermark delay with update/append output (SURVEY §2's
    * trigger-equivalence note). Works on both batch and streaming
    * frames (`readStream` in, `writeStream` out).
    */
  def leaderBoardTeamScores(events: DataFrame, teamCol: String, scoreCol: String,
                            tsCol: String, duration: String = "1 hour",
                            allowedLateness: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, allowedLateness)
      .groupBy(window(col(tsCol), duration), col(teamCol).as("team"))
      .agg(sum(col(scoreCol)).as("total_score"))
      .select(col("window.start").as("window_start"), col("team"), col("total_score"))

  /** complete/game/LeaderBoard.scala user arm: running global user
    * totals (the original's global window + speculative panes =
    * streaming aggregate in update/complete mode).
    */
  def leaderBoardUserScores(events: DataFrame, userCol: String, scoreCol: String): DataFrame =
    events.groupBy(col(userCol).as("user"))
      .agg(sum(col(scoreCol)).as("total_score"))

  def trafficMaxLaneFlow(readings: DataFrame, stationCol: String, laneCol: String,
                         flowCol: String, speedCol: String, tsCol: String,
                         duration: String = "60 minutes",
                         slide: String = "5 minutes"): DataFrame =
    readings
      .groupBy(window(col(tsCol), duration, slide), col(stationCol).as("station"))
      .agg(max(struct(col(flowCol).as("flow"), col(laneCol).as("lane"),
        col(speedCol).as("speed"))).as("m"))
      .select(col("window.start").as("window_start"), col("station"),
        col("m.flow").as("lane_max_flow"), col("m.lane").as("lane"),
        col("m.speed").as("avg_speed"))
}
