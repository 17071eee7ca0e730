package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Time-series verbs scio pipelines hand-roll from stateful DoFns and
  * Iterators.timeSeries (reference: scio-extra Iterators.scala:45 and
  * the examples' sessionization patterns): fixed-grid resampling with
  * forward fill, interval coalescing, and exponential moving averages.
  *
  * Scale shape: resample/gap-fill is one per-(key,bucket) partial agg
  * plus one per-key window pass (the grid explodes from a per-key
  * 2-value aggregate, never from the raw rows); interval coalescing is
  * one window pass + one partial agg; EMA is a true streaming fold —
  * repartition by key, sort within partitions, one linear scan — so a
  * key's history is never materialized as an array.
  */
object TimeSeries {

  /** Resample to a fixed `stepSec` grid per key with forward fill:
    * each bucket reports the LAST observation in it (ties broken
    * lexicographically on the value struct — deterministic), and empty
    * buckets between a key's first and last observation carry the
    * previous bucket's value forward. Output: key, `ts` (bucket start,
    * timestamp), one filled column per `valCols`.
    */
  def gapFill(df: DataFrame, keyCol: String, tsCol: String, valCols: Seq[String],
              stepSec: Long): DataFrame = {
    require(stepSec > 0, s"stepSec must be positive, got $stepSec")
    require(valCols.nonEmpty, "gapFill needs at least one value column")
    import org.apache.spark.sql.expressions.Window
    val bucket = floor(unix_seconds(col(tsCol)) / stepSec) * stepSec
    // last observation per (key, bucket): ONE lexicographic max struct
    // — partial-aggregates map-side, no window over raw rows
    val ordStruct = struct(col(tsCol) +: valCols.map(col): _*)
    val sampled = df
      .filter(col(tsCol).isNotNull)
      .groupBy(col(keyCol).as("__k"), bucket.as("__b"))
      .agg(max(ordStruct).as("__last"))
      .select(col("__k"), col("__b"),
        struct(valCols.map(v => col(s"__last.$v").as(v)): _*).as("__v"))
    // grid from the per-key [min,max] bucket span — two numbers per
    // key, so the explode is narrow and never touches raw rows
    val grid = sampled.groupBy(col("__k"))
      .agg(min(col("__b")).as("__lo"), max(col("__b")).as("__hi"))
      .select(col("__k"),
        explode(sequence(col("__lo"), col("__hi"), lit(stepSec))).as("__b"))
    // forward fill: one window pass per key ordered by bucket
    val w = Window.partitionBy(col("__k")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(sampled, Seq("__k", "__b"), "left")
      .withColumn("__f", last(col("__v"), ignoreNulls = true).over(w))
      .select(col("__k").as(keyCol) +: timestamp_seconds(col("__b")).as(tsCol) +:
        valCols.map(v => col(s"__f.$v").as(v)): _*)
  }

  /** Merge overlapping or abutting [startCol, endCol] intervals per
    * key (interval coalescing): output one row per merged span with
    * `n_merged` source intervals. Intervals where end < start are
    * rejected; touching intervals (next.start == prev.end) merge.
    * One window pass (running max of end) + one partial agg.
    */
  def coalesceIntervals(df: DataFrame, keyCols: Seq[String], startCol: String,
                        endCol: String): DataFrame = {
    require(keyCols.nonEmpty, "coalesceIntervals needs at least one key column")
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol)).over(byKey.rowsBetween(Window.unboundedPreceding, -1))
    val marked = df
      .filter(col(startCol).isNotNull && col(endCol).isNotNull)
      .withColumn("__new", when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("__grp", sum(col("__new"))
        .over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked.groupBy(keyCols.map(col) :+ col("__grp"): _*)
      .agg(min(col(startCol)).as(startCol), max(col(endCol)).as(endCol),
        count(lit(1)).as("n_merged"))
      .drop("__grp")
  }

  /** Exponential moving average per key over event order: with
    * smoothing `alpha`, `ema_1 = x_1` and
    * `ema_i = alpha * x_i + (1 - alpha) * ema_{i-1}` over rows ordered
    * by (`tsCol`, `tieCols`…) within each key. Appends `outCol` to the
    * input columns.
    *
    * A recursive fold has no window-function form, so this is the one
    * shape a stateful pass is genuinely for: repartition by key, sort
    * within partitions, ONE linear scan carrying (key, running ema) —
    * the per-key history is never collected into memory (scio: a
    * stateful DoFn; Iterators.scala would buffer the window).
    */
  def ema(df: DataFrame, keyCol: String, tsCol: String, valCol: String, alpha: Double,
          outCol: String = "ema", tieCols: Seq[String] = Nil): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(!df.columns.contains(outCol), s"column $outCol already exists")
    val sorted = df
      .filter(col(valCol).isNotNull)
      .repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol) +: col(tsCol) +: tieCols.map(col): _*)
    val outSchema = StructType(sorted.schema.fields :+ StructField(outCol, DoubleType))
    val keyIdx = sorted.schema.fieldIndex(keyCol)
    val valIdx = sorted.schema.fieldIndex(valCol)
    val oneMinus = 1 - alpha
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    sorted.mapPartitions { rows =>
      var curKey: Any = null
      var started = false
      var acc = 0.0
      rows.map { r =>
        val k = r.get(keyIdx)
        val x = r.get(valIdx) match {
          case n: java.lang.Number => n.doubleValue()
          case other => throw new IllegalArgumentException(
            s"ema needs a numeric value column, got $other")
        }
        if (!started || k != curKey) { curKey = k; started = true; acc = x }
        else acc = alpha * x + oneMinus * acc
        Row.fromSeq(r.toSeq :+ acc)
      }
    }(enc)
  }

  /** Per-key trailing time-window aggregates: for each row, count /
    * sum / avg / min / max of `valCol` over this key's rows in the
    * half-open trailing window (t − windowSec, t] — the rolling
    * metrics view (per-device rates, per-user activity) a monitoring
    * pipeline keys dashboards on. One window spec = one hash shuffle
    * + per-key sort; the RANGE frame makes timestamp TIES
    * frame-deterministic (all peers included) regardless of their
    * sort order, so the result is engine- and partitioning-stable.
    * Skew contract matches [[graft.operators.Temporal.asofJoin]]:
    * WindowExec gives one linear task per hot key; chunk the key for
    * ultra-hot streams (asofJoinChunked shows the shape).
    */
  def rolling(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
              windowSec: Long): DataFrame = {
    require(windowSec >= 1, s"windowSec must be >= 1, got $windowSec")
    // Materialize the order key ONCE (r17): ordering by the raw
    // `unix_micros(ts)` expression makes every `.over(w)` project a
    // fresh `_w0#N` alias, so adjacent Window nodes order by DIFFERENT
    // attributes and CollapseWindow cannot merge them — five WindowExecs
    // and five per-partition sorts over an identical frame (the r16
    // plan dump proved it). Ordering all five aggregates by the same
    // materialized column collapses them to ONE Window + ONE Sort, the
    // rollingChunked pattern.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col("__roll_us"))
      .rangeBetween(-(windowSec * 1000000L) + 1L, 0L)
    df.withColumn("__roll_us", unix_micros(col(tsCol)))
      .withColumn("roll_n", count(col(valCol)).over(w))
      .withColumn("roll_sum", sum(col(valCol)).over(w))
      .withColumn("roll_avg", avg(col(valCol)).over(w))
      .withColumn("roll_min", min(col(valCol)).over(w))
      .withColumn("roll_max", max(col(valCol)).over(w))
      .drop("__roll_us")
  }

  /** Hot-key [[rolling]]: identical output, but the window key is
    * (key, time-chunk) instead of key — an ultra-hot key's rows (one
    * instrument carrying 30% of a feed) spread over (time-range /
    * `chunkSec`) tasks instead of serializing on one core, the same
    * straggler bound [[graft.operators.Temporal.asofJoinChunked]]
    * kills for as-of joins.
    *
    * Mechanics: a row near the END of a chunk still contributes to
    * trailing windows in the NEXT chunk(s), so each row is also
    * replicated as a non-emitting CARRY row into every later chunk
    * its window tail reaches — exactly ⌈windowSec/chunkSec⌉ chunks,
    * and only when the row's tail actually crosses the boundary. With
    * `chunkSec >= windowSec` (the intended operating point) that is
    * at most ONE carry copy per row, and only for rows within
    * `windowSec` of a chunk end. Within each (key, chunk) partition
    * the same RANGE frame as [[rolling]] runs over natives + carries;
    * only natives are emitted, and a row appears in any partition at
    * most once, so no aggregate double-counts. Placement is pure
    * integer arithmetic — results are bit-identical to [[rolling]]
    * at every chunk size.
    */
  def rollingChunked(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
                     windowSec: Long, chunkSec: Long): DataFrame = {
    require(windowSec >= 1, s"windowSec must be >= 1, got $windowSec")
    require(chunkSec >= 1, s"chunkSec must be >= 1, got $chunkSec")
    val winUs = windowSec * 1000000L
    val chunkUs = chunkSec * 1000000L
    // how many later chunks a row's trailing-window tail can reach —
    // the carry REPLICATION FACTOR. Fail fast on pathological ratios
    // instead of silently exploding rows (and overflowing toInt): the
    // intended operating point is chunkSec >= windowSec (one carry).
    val reps64 = (winUs - 1) / chunkUs + 1
    require(reps64 <= 1024,
      s"chunkSec=$chunkSec replicates each row ${reps64}x against windowSec=$windowSec; " +
        "pick a chunk no smaller than windowSec/1024 (chunkSec >= windowSec is the " +
        "intended operating point)")
    val reps = reps64.toInt
    val us = col("__roll_us")
    val base = df
      .withColumn("__roll_us", unix_micros(col(tsCol)))
      // integer floor division (`div`, not `/` — long/long is DOUBLE
      // in Spark), correct for pre-epoch micros via pmod
      .withColumn("__roll_chunk",
        call_function("div", us - pmod(us, lit(chunkUs)), lit(chunkUs)))
    val native = base.withColumn("__roll_emit", lit(true))
    // a row at time t reaches chunk c+r iff t + winUs > (c+r)·chunkUs
    val carry = base
      .select(col("*"),
        explode(sequence(lit(1), lit(reps))).as("__roll_r"))
      .filter(us + lit(winUs) > (col("__roll_chunk") + col("__roll_r")) * lit(chunkUs))
      .withColumn("__roll_chunk", col("__roll_chunk") + col("__roll_r"))
      .drop("__roll_r")
      .withColumn("__roll_emit", lit(false))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol), col("__roll_chunk"))
      .orderBy(us)
      .rangeBetween(-winUs + 1L, 0L)
    native.unionByName(carry)
      .withColumn("roll_n", count(col(valCol)).over(w))
      .withColumn("roll_sum", sum(col(valCol)).over(w))
      .withColumn("roll_avg", avg(col(valCol)).over(w))
      .withColumn("roll_min", min(col(valCol)).over(w))
      .withColumn("roll_max", max(col(valCol)).over(w))
      .filter(col("__roll_emit"))
      .drop("__roll_us", "__roll_chunk", "__roll_emit")
  }
}
