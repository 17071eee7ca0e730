package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics: funnels and cohort retention — the
  * product-analytics shapes scio pipelines assemble from groupBy/join
  * verbs over event streams (reference: scio-core values/
  * PairSCollectionFunctions.scala join + aggregateByKey building
  * blocks; scio-examples event pipelines). Declarative join-chains,
  * no per-user state collection.
  */
object Events {

  /** Per-user step-completion times for an ordered funnel: the user's
    * time for step i is the EARLIEST event of `steps(i)` strictly
    * after their step-(i-1) time (first-touch attribution), optionally
    * within `withinSec` seconds of the step-1 time. Returns one row
    * per user who completed at least step 1: (user, t1 … tk), null
    * for unreached steps.
    *
    * Scale shape: one filtered min-aggregate per step (map-side
    * partial), chained through user-keyed joins whose right side
    * shrinks monotonically (step-i completers ⊆ step-(i-1)
    * completers); no window over the raw stream, no event
    * re-sort, no per-user event collection.
    */
  def funnelTimes(df: DataFrame, userCol: String, typeCol: String, tsCol: String,
                  steps: Seq[String], withinSec: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate funnel steps: $steps")
    withinSec.foreach(w => require(w > 0, s"withinSec must be > 0, got $w"))
    // anonymous (null-user) events cannot funnel: every step link is a
    // user-keyed join, so a null user would inconsistently reach step 1
    // and never step 2 — excluded up front instead
    val ev = df.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
    val first = ev.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("__u"))
      .agg(min(col(tsCol)).as("t1"))
    // chain carries (__u, t1, t_last): t1 anchors the horizon, t_last
    // gates the next step's strict ordering. Each step's (user, time)
    // frame is kept aside; the cumulative left-join assembly at the
    // end is sound because step-i completion implies step-(i-1)
    // completion — nulls cascade by construction.
    var chain = first.select(col("__u"), col("t1"), col("t1").as("__tlast"))
    val frames = scala.collection.mutable.ArrayBuffer[(String, DataFrame)](
      "t1" -> first)
    steps.zipWithIndex.drop(1).foreach { case (step, i) =>
      val tThis = s"t${i + 1}"
      val horizon = withinSec match {
        case Some(w) => col(tsCol) <= col("t1") + expr(s"INTERVAL $w SECONDS")
        case None    => lit(true)
      }
      val next = ev.filter(col(typeCol) === step)
        .join(chain, col(userCol) === col("__u"))
        .filter(col(tsCol) > col("__tlast") && horizon)
        .groupBy(col("__u"))
        .agg(min(col("t1")).as("t1"), min(col(tsCol)).as(tThis))
      frames += tThis -> next.select(col("__u"), col(tThis))
      chain = next.select(col("__u"), col("t1"), col(tThis).as("__tlast"))
    }
    frames.map(_._2).reduceLeft { (acc, f) =>
      val other = f.withColumnRenamed("__u", "__u2")
      acc.join(other, col("__u") === col("__u2"), "left").drop("__u2")
    }.withColumnRenamed("__u", userCol)
  }

  /** Funnel summary: one row per step with the user count that
    * reached it. (step_idx, step, users).
    */
  def funnel(df: DataFrame, userCol: String, typeCol: String, tsCol: String,
             steps: Seq[String], withinSec: Option[Long] = None): DataFrame = {
    val times = funnelTimes(df, userCol, typeCol, tsCol, steps, withinSec)
    val counts = times.agg(
      count(col("t1")).as("c1"),
      (2 to steps.size).map(i => count(col(s"t$i")).as(s"c$i")): _*)
    val rows = steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).as("step_idx"), lit(s).as("step"),
        col(s"c${i + 1}").as("users"))
    }
    counts.select(explode(array(rows: _*)).as("r"))
      .select(col("r.step_idx"), col("r.step"), col("r.users"))
      .orderBy(col("step_idx"))
  }

  /** Cohort retention: users are cohorted by the DAY of their first
    * `cohortType` event; a user is active in period n if they have
    * ANY event in [cohort + n·periodDays, cohort + (n+1)·periodDays).
    * Returns (cohort_day, period, active_users). Period arithmetic is
    * pure integer microseconds — engine-exact.
    *
    * Scale shape: per-user min-agg for cohorts, one user-keyed join
    * back (no broadcast assumption — user cardinality is unbounded),
    * distinct on (user, cohort, period), then the tiny final agg.
    */
  def retention(df: DataFrame, userCol: String, typeCol: String, tsCol: String,
                cohortType: String, periodDays: Int = 7): DataFrame = {
    require(periodDays >= 1, s"periodDays must be >= 1, got $periodDays")
    val periodMicros = periodDays * 86400L * 1000000L
    // null users cannot cohort (every link is a user-keyed join) —
    // excluded up front, same contract as the funnel
    val ev = df.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
    val cohorts = ev.filter(col(typeCol) === cohortType)
      .groupBy(col(userCol).as("__u"))
      .agg(date_trunc("day", min(col(tsCol))).as("__cohort"))
    ev.select(col(userCol), col(tsCol))
      .join(cohorts, col(userCol) === col("__u"))
      .filter(col(tsCol) >= col("__cohort"))
      .select(col("__u"),
        col("__cohort"),
        floor((unix_micros(col(tsCol)) - unix_micros(col("__cohort"))) / periodMicros)
          .cast("int").as("period"))
      .distinct()
      .groupBy(col("__cohort"), col("period"))
      .agg(count(lit(1)).as("active_users"))
      .select(date_format(col("__cohort"), "yyyy-MM-dd").as("cohort_day"),
        col("period"), col("active_users"))
      .orderBy(col("cohort_day"), col("period"))
  }

  /** Last-touch attribution: for each conversion event, the most
    * recent preceding touch event (per user, within `lookbackSec`) —
    * the standard marketing/causal-credit question over an event
    * stream, composed from the as-of join machinery ([[Temporal
    * .asofJoin]]: one keyed window pass, O(touches + conversions),
    * never an inequality range join). Conversions with no in-window
    * touch keep their row with a null `touch_type`/`touch_ts`
    * (unattributed conversions are the interesting ones).
    *
    * Returns (userCol, conv_ts, touch_type, touch_ts). Ties: a touch
    * at the conversion's exact timestamp attributes (backward as-of
    * includes equal-ts rows); two touches at the SAME instant
    * collapse deterministically to the lexicographically largest
    * type before the join (real data has ties — an arbitrary pick
    * would flake).
    */
  def lastTouch(df: DataFrame, userCol: String, typeCol: String, tsCol: String,
                touchTypes: Seq[String], conversionType: String,
                lookbackSec: Long): DataFrame = {
    require(touchTypes.nonEmpty, "lastTouch needs at least one touch type")
    require(lookbackSec > 0, s"lookbackSec must be positive, got $lookbackSec")
    require(!touchTypes.contains(conversionType),
      s"conversion type '$conversionType' cannot also be a touch type")
    val conversions = df.filter(col(typeCol) === conversionType)
      .select(col(userCol), col(tsCol).as("conv_ts"))
    val touches = df.filter(col(typeCol).isin(touchTypes: _*))
      .groupBy(col(userCol), col(tsCol).as("__touch_ts"))
      .agg(max(col(typeCol)).as("touch_type"))
    Temporal.asofJoin(conversions, touches, userCol,
        "conv_ts", "__touch_ts", valueCols = Seq("touch_type"),
        direction = "backward", toleranceSec = Some(lookbackSec),
        matchedTsCol = Some("touch_ts"))
      .select(col(userCol), col("conv_ts"), col("touch_type"), col("touch_ts"))
  }

  /** LINEAR multi-touch attribution beside [[lastTouch]]: every touch
    * inside the conversion's lookback window shares the conversion's
    * credit equally (credit = 1/n per touch) — the other standard
    * attribution model, answering "which channels participated"
    * rather than "which channel closed". Returns one row per
    * (conversion, touch): (user, conv_ts, touch_ts, touch_type,
    * n_touches, credit).
    *
    * Scale shape: the window membership is [[Temporal.intervalJoin]]
    * (bucketed equality join, never an open range join); the
    * per-conversion touch count rides ONE window over the pair rows
    * (already co-partitioned by user from the join). Duplicate
    * conversion rows (same user, same µs) collapse first — they would
    * silently double credit.
    */
  def attributionLinear(df: DataFrame, userCol: String, typeCol: String,
                        tsCol: String, touchTypes: Seq[String],
                        conversionType: String, lookbackSec: Long): DataFrame = {
    require(touchTypes.nonEmpty, "attributionLinear needs at least one touch type")
    require(lookbackSec > 0, s"lookbackSec must be positive, got $lookbackSec")
    require(!touchTypes.contains(conversionType),
      s"conversion type '$conversionType' cannot also be a touch type")
    val conv = df.filter(col(typeCol) === conversionType && col(userCol).isNotNull)
      .select(col(userCol), col(tsCol).as("conv_ts")).distinct()
      .withColumn("__w_start", col("conv_ts") - expr(s"INTERVAL $lookbackSec SECONDS"))
    val touches = df.filter(col(typeCol).isin(touchTypes: _*) && col(userCol).isNotNull)
      .select(col(userCol), col(tsCol).as("touch_ts"), col(typeCol).as("touch_type"))
    val pairs = Temporal.intervalJoin(touches, conv, userCol,
      "touch_ts", "__w_start", "conv_ts",
      bucketSec = math.max(lookbackSec / 4, 1L), maxIntervalSec = lookbackSec)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol), col("conv_ts"))
    pairs
      .withColumn("n_touches", count(lit(1)).over(w))
      .select(col(userCol), col("conv_ts"), col("touch_ts"), col("touch_type"),
        col("n_touches"), (lit(1.0) / col("n_touches")).as("credit"))
  }

  /** TIME-DECAY multi-touch attribution: like [[attributionLinear]]
    * but recent touches earn more — raw weight
    * 0.5^(Δseconds / halfLifeSec) (a touch one half-life before the
    * conversion is worth half an at-conversion touch), normalized per
    * conversion so each conversion still distributes exactly 1.0
    * credit. Same interval-join + single-window scale shape; the
    * normalizing sum rides the same window as the count. Δ uses µs
    * integer arithmetic before the one double division, so weights
    * are reproducible across engines.
    */
  def attributionTimeDecay(df: DataFrame, userCol: String, typeCol: String,
                           tsCol: String, touchTypes: Seq[String],
                           conversionType: String, lookbackSec: Long,
                           halfLifeSec: Long): DataFrame = {
    require(halfLifeSec > 0, s"halfLifeSec must be positive, got $halfLifeSec")
    require(touchTypes.nonEmpty, "attributionTimeDecay needs at least one touch type")
    require(lookbackSec > 0, s"lookbackSec must be positive, got $lookbackSec")
    require(!touchTypes.contains(conversionType),
      s"conversion type '$conversionType' cannot also be a touch type")
    val conv = df.filter(col(typeCol) === conversionType && col(userCol).isNotNull)
      .select(col(userCol), col(tsCol).as("conv_ts")).distinct()
      .withColumn("__w_start", col("conv_ts") - expr(s"INTERVAL $lookbackSec SECONDS"))
    val touches = df.filter(col(typeCol).isin(touchTypes: _*) && col(userCol).isNotNull)
      .select(col(userCol), col(tsCol).as("touch_ts"), col(typeCol).as("touch_type"))
    val pairs = Temporal.intervalJoin(touches, conv, userCol,
      "touch_ts", "__w_start", "conv_ts",
      bucketSec = math.max(lookbackSec / 4, 1L), maxIntervalSec = lookbackSec)
    val weight = pow(lit(0.5),
      (unix_micros(col("conv_ts")) - unix_micros(col("touch_ts"))).cast("double") /
        (halfLifeSec * 1000000.0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol), col("conv_ts"))
    pairs
      .withColumn("__w", weight)
      .withColumn("credit", col("__w") / sum(col("__w")).over(w))
      .select(col(userCol), col("conv_ts"), col("touch_ts"), col("touch_type"),
        col("credit"))
  }

  /** First-order transition census over each user's event stream —
    * the (from → to) counts behind flow/Sankey views and Markov-chain
    * behavior models: consecutive event pairs in per-user
    * (ts, tieCols) order, counted corpus-wide. Pass `tieCols` (e.g.
    * the event id) whenever timestamps can repeat — without a total
    * order the successor of a tied event is undefined and the census
    * is not reproducible. One window pass clustered by user (per-user
    * linear; ultra-hot users chunk like asofJoinChunked) + one
    * partial-agg count; transition cardinality ≤ |types|², tiny.
    */
  def transitions(df: DataFrame, userCol: String, tsCol: String, typeCol: String,
                  tieCols: Seq[String] = Nil): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(col(tsCol) +: tieCols.map(col): _*)
    df.withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }
}
