package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import QueryDsl._

/** End-to-end Structured Streaming oracle queries (r16).
  *
  * The streaming operators (graft.streaming.Windows / StreamDedup /
  * Sessionize) were spec-pinned on MemoryStream inputs; these queries
  * put the three core stateful shapes — cross-batch dedup, windowed
  * aggregation, built-in session windows — on the DuckDB oracle path
  * through a REAL multi-batch stream: file source, maxFilesPerTrigger
  * = 1, Trigger.AvailableNow, parquet streaming sink, gather, compare
  * hash-exact against the batch answer (reference semantics:
  * scio-core SCollection.distinct / WindowedSCollection fixed and
  * session windows on unbounded input).
  *
  * Two mechanics make the streams deterministic and complete:
  *
  *  - '''Watermark delay covers the staged disorder.''' The staging
  *    split scatters the 30-day corpus randomly across files, so a
  *    later micro-batch can carry rows 30 days older than the current
  *    watermark; a delay wider than the corpus span (40 days) means no
  *    real row is ever late-dropped. At production rates the delay is
  *    sized to the real out-of-orderness instead — this is the
  *    replay-horizon sizing documented on [[graft.streaming.StreamDedup]].
  *
  *  - '''Sentinel batches flush append-mode state.''' Append mode only
  *    emits a window/session once the watermark passes its end, and an
  *    AvailableNow stream terminates WITHOUT flushing still-open state
  *    (pinned in StreamingSpec's end-to-end test). Two sentinel rows
  *    far past the corpus (Apr/May 2024), staged as the two
  *    LAST-mtime files, close everything real: sentinel 1's batch
  *    advances the watermark past every real window end, and sentinel
  *    2's batch is the data batch in which that watermark evicts (=
  *    emits) the real state. Sentinel rows themselves stay open /
  *    identifiable and are filtered out of the gathered result. The
  *    file source processes oldest-mtime first (latestFirst=false
  *    default), so the sentinels' +60s/+120s mtimes pin their order
  *    after the real batches.
  */
object StreamQueries extends QueryPack {

  private val runToken: String = QueryDsl.runToken
  private def tmp(dir: String, leaf: String): String = {
    val mine = new java.io.File(s"/tmp/graft_io/$runToken")
    mine.mkdirs()
    mine.deleteOnExit()
    s"/tmp/graft_io/$runToken/${dir.replaceAll("[^a-zA-Z0-9]", "_")}/$leaf"
  }

  private def wipe(paths: String*): Unit =
    paths.foreach(p => org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))

  /** Bump the mtime of every data file under `dir` to `t` — the file
    * source orders batches by mtime, so this pins sentinel files after
    * the real ones regardless of how fast the writes ran.
    */
  private def stampMtime(dir: String, t: Long): Unit =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .foreach(f => require(f.setLastModified(t), s"setLastModified failed on $f"))

  /** Copy the data files of staged parquet dir `from` into `to` under
    * a distinct name prefix (the staging dirs are written by separate
    * Spark jobs whose part-file names can collide).
    */
  private def adoptFiles(from: String, to: String, prefix: String, mtime: Long): Unit = {
    val dst = new java.io.File(to)
    new java.io.File(from).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .zipWithIndex.foreach { case (f, i) =>
        val target = new java.io.File(dst, s"$prefix-$i-${f.getName}")
        java.nio.file.Files.copy(f.toPath, target.toPath)
        require(target.setLastModified(mtime), s"setLastModified failed on $target")
      }
  }

  /** Append the two sentinel batches to a staged source dir: real
    * files are pinned to a common base mtime, then one Apr-1 and one
    * May-1 sentinel file land at +60s/+120s so they form the last two
    * micro-batches (see class doc). `row(tsLiteral)` builds the 1-row
    * sentinel frame in the source's schema.
    */
  private def addSentinels(src: String, scratch: String,
                           row: String => DataFrame): Unit = {
    val base = System.currentTimeMillis()
    stampMtime(src, base)
    Seq(("2024-04-01 00:00:00", "sent1"), ("2024-05-01 00:00:00", "sent2"))
      .zipWithIndex.foreach { case ((tsLit, name), i) =>
        val one = s"$scratch/$name"
        row(tsLit).coalesce(1).write.parquet(one)
        adoptFiles(one, src, name, base + (i + 1) * 60000L)
      }
  }

  private def awaitOrFail(q: org.apache.spark.sql.streaming.StreamingQuery,
                          name: String): Unit =
    if (!q.awaitTermination(300000)) {
      q.stop()
      throw new IllegalStateException(s"$name: AvailableNow stream did not finish in 300s")
    }

  /** Run-once staging per (JVM, sf dir): reuse of a finished stream's
    * output; a re-stage under a surviving checkpoint would read the
    * fresh part-file names as new data (the q_stream_dynamic
    * precedent).
    */
  private val stages = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def staged(key: String, dir: String)(run: () => String): String =
    stages.computeIfAbsent(s"$key|$dir", _ => run())

  /** Cross-batch exact dedup: the corpus doubled (every event staged
    * twice, copies scattered across 4 files so many pairs straddle
    * micro-batches), streamed through StreamDedup.dedup keyed on
    * (event_id, ts). Dedup emits first-sightings immediately (no
    * sentinel needed); the 60-day watermark keeps every replay inside
    * the horizon. The gathered result must be exactly the original
    * table.
    */
  private def streamDedupOut(s: SparkSession, dir: String): String =
    staged("dedup", dir) { () =>
      val src = tmp(dir, "stream_dedup_src")
      val out = tmp(dir, "stream_dedup_out")
      val ckp = tmp(dir, "stream_dedup_ckp")
      wipe(src, out, ckp)
      val ev = tables(s, dir).events
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      // repartition(4) without keys = round-robin of the doubled rows:
      // the two copies of an event land in arbitrary files, so the
      // dedup state must survive across micro-batches to suppress them
      ev.union(ev).repartition(4).write.mode("overwrite").parquet(src)
      val schema = s.read.parquet(src).schema
      val deduped = graft.streaming.StreamDedup.dedup(
        s.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        Seq("event_id"), "ts", "60 days")
      val q = deduped.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckp)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      awaitOrFail(q, "q_stream_dedup")
      out
    }

  /** Tumbling 1-hour windows per event type over the real stream,
    * sentinel-flushed (see class doc). Same aggregate shape and oracle
    * as the batch q_window_fixed.
    */
  private def streamWindowOut(s: SparkSession, dir: String): String =
    staged("window", dir) { () =>
      val src = tmp(dir, "stream_win_src")
      val sent = tmp(dir, "stream_win_sent")
      val out = tmp(dir, "stream_win_out")
      val ckp = tmp(dir, "stream_win_ckp")
      wipe(src, sent, out, ckp)
      tables(s, dir).events.select(col("ts"), col("event_type"), col("value"))
        .repartition(4).write.mode("overwrite").parquet(src)
      // two sentinel batches: Apr 1 advances the watermark (40-day
      // delay → Feb 21, past every real window end of Jan 31); May 1's
      // batch emits the real windows under that watermark
      addSentinels(src, sent, tsLit => s.range(1).select(
        to_timestamp(lit(tsLit)).as("ts"),
        lit("__sentinel").as("event_type"),
        lit(0.0).as("value")))
      val schema = s.read.parquet(src).schema
      val agg = graft.streaming.Windows.fixedGroups(
          s.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
          "ts", "1 hour", "40 days", col("event_type"))
        .agg(count(lit(1)).as("n"), r2(sum(dec(col("value")))).cast("double").as("sum_v"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("w_start"),
          col("event_type"), col("n"), col("sum_v"))
      val q = agg.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckp)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      awaitOrFail(q, "q_stream_window")
      out
    }

  /** Built-in session_window sessionization per user over the real
    * stream, sentinel-flushed. The sentinel user (-1) opens its own
    * session that stays open/filtered. Aggregates min/max(ts) directly
    * (session_window.end is last+gap, not last).
    */
  private def streamSessionOut(s: SparkSession, dir: String): String =
    staged("session", dir) { () =>
      val src = tmp(dir, "stream_sess_src")
      val sent = tmp(dir, "stream_sess_sent")
      val out = tmp(dir, "stream_sess_out")
      val ckp = tmp(dir, "stream_sess_ckp")
      wipe(src, sent, out, ckp)
      tables(s, dir).events.select(col("user_id"), col("ts"), col("value"))
        .repartition(4).write.mode("overwrite").parquet(src)
      addSentinels(src, sent, tsLit => s.range(1).select(
        lit(-1L).as("user_id"),
        to_timestamp(lit(tsLit)).as("ts"),
        lit(0.0).as("value")))
      val schema = s.read.parquet(src).schema
      val agg = graft.streaming.Windows.sessionGroups(
          s.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
          "ts", "30 minutes", "40 days", col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("sess_start"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("sess_end"),
          r2(sum(dec(col("value")))).cast("double").as("sum_v"))
        .select(col("user_id"), col("n_events"), col("sess_start"),
          col("sess_end"), col("sum_v"))
      val q = agg.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckp)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      awaitOrFail(q, "q_stream_session")
      out
    }

  /** Stream-stream windowed join over TWO real streams: clicks and
    * purchases staged as separate 4-file sources, joined on
    * (user_id, epoch hour) via StreamJoins.windowedJoin. Inner-join
    * matches emit in the micro-batch where the second side arrives —
    * no sentinel needed; the 40-day watermark keeps join state alive
    * across the whole staged disorder (nothing is evicted before the
    * last batch), so every cross-batch pair is found. Raw pairs go to
    * the sink; the gather aggregates (a streaming aggregation AFTER a
    * stream-stream join would need its own watermark flush).
    */
  private def streamJoinOut(s: SparkSession, dir: String): String =
    staged("join", dir) { () =>
      val srcL = tmp(dir, "stream_join_clicks")
      val srcR = tmp(dir, "stream_join_purch")
      val out = tmp(dir, "stream_join_out")
      val ckp = tmp(dir, "stream_join_ckp")
      wipe(srcL, srcR, out, ckp)
      val ev = tables(s, dir).events
      ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"))
        .repartition(4).write.mode("overwrite").parquet(srcL)
      ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("b_ts"))
        .repartition(4).write.mode("overwrite").parquet(srcR)
      def rd(p: String) =
        s.readStream.schema(s.read.parquet(p).schema)
          .option("maxFilesPerTrigger", 1).parquet(p)
      val joined = graft.streaming.StreamJoins.windowedJoin(
          rd(srcL), rd(srcR), "user_id", "c_ts", "b_ts", "1 hour", "40 days")
        .select(col("user_id"), unix_micros(col("c_ts")).as("c_us"),
          unix_micros(col("b_ts")).as("b_us"))
      val q = joined.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckp)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      awaitOrFail(q, "q_stream_join")
      out
    }

  /** The custom-state sessionizer (flatMapGroupsWithState +
    * event-time timers) through its REAL streaming path — emitOpen =
    * false, sessions emitted by watermark-driven timeouts, not the
    * batch flush q_session_state exercises. Sentinel-flushed like
    * q_stream_session: sentinel 1 advances the watermark past every
    * real session's expiry, sentinel 2's batch fires the timers. The
    * sentinel user's own sessions never expire and never emit.
    */
  private def streamSessionStateOut(s: SparkSession, dir: String): String =
    staged("session_state", dir) { () =>
      val src = tmp(dir, "stream_sstate_src")
      val sent = tmp(dir, "stream_sstate_sent")
      val out = tmp(dir, "stream_sstate_out")
      val ckp = tmp(dir, "stream_sstate_ckp")
      wipe(src, sent, out, ckp)
      tables(s, dir).events
        .select(col("user_id").as("userId"), col("ts"), col("value"))
        .repartition(4).write.mode("overwrite").parquet(src)
      addSentinels(src, sent, tsLit => s.range(1).select(
        lit(-1L).as("userId"),
        to_timestamp(lit(tsLit)).as("ts"),
        lit(0.0).as("value")))
      import s.implicits._
      val schema = s.read.parquet(src).schema
      val ev = s.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        .withWatermark("ts", "40 days")
        .as[graft.streaming.Event]
      val sessions = graft.streaming.Sessionize.sessions(ev, gapSec = 1800L)
      val q = sessions.toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckp)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      awaitOrFail(q, "q_stream_session_state")
      out
    }

  override val queries: Map[String, Q] = Map(
    "q_stream_dedup" -> { (s, dir) =>
      s.read.parquet(streamDedupOut(s, dir))
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
        .orderBy(col("event_id"))
    },

    "q_stream_window" -> { (s, dir) =>
      s.read.parquet(streamWindowOut(s, dir))
        .filter(col("event_type") =!= "__sentinel")
        .orderBy(col("w_start"), col("event_type"))
    },

    "q_stream_session" -> { (s, dir) =>
      s.read.parquet(streamSessionOut(s, dir))
        .filter(col("user_id") >= 0L)
        .orderBy(col("user_id"), col("sess_start"))
    },

    "q_stream_join" -> { (s, dir) =>
      s.read.parquet(streamJoinOut(s, dir))
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("user_id"))
    },

    "q_stream_session_state" -> { (s, dir) =>
      s.read.parquet(streamSessionStateOut(s, dir))
        .filter(col("userId").between(0L, 100L))
        .select(col("userId").as("user_id"),
          col("nEvents").as("n_events"),
          date_format(col("sessStart"), "yyyy-MM-dd HH:mm:ss").as("sess_start"),
          date_format(col("sessEnd"), "yyyy-MM-dd HH:mm:ss").as("sess_end"),
          r2(col("sumValue")).as("sum_v"))
        .orderBy(col("user_id"), col("sess_start"))
    }
  )

  override val oracles: Map[String, String] = Map(
    // the doubled stream dedups back to exactly the original table
    "q_stream_dedup" ->
      """SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value
        |FROM events ORDER BY event_id""".stripMargin,
    // identical to the batch q_window_fixed oracle: the stream must
    // reproduce the batch answer exactly (unified-model contract)
    "q_stream_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS w_start,
        |  event_type, count(*) AS n, CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_v
        |FROM events GROUP BY w_start, event_type ORDER BY w_start, event_type""".stripMargin,
    // lag+cumsum sessionization (the q_session_state oracle shape,
    // full user range). Spark's session_window treats a gap-boundary
    // pair (diff == gap exactly) as one session — `> gap` starts a new
    // one, matching the batch operators.
    "q_stream_session" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sess AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        |  FROM flagged)
        |SELECT user_id, count(*) AS n_events,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS sess_end,
        |  CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_v
        |FROM sess GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_start""".stripMargin,
    // identical to the batch q_windowed_join oracle: the two-stream
    // join must find every cross-batch pair
    "q_stream_join" ->
      """SELECT c.user_id, count(*) AS n_pairs
        |FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
        |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        | AND date_trunc('hour', c.ts) = date_trunc('hour', p.ts)
        |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin,
    // the q_session_state oracle (timer-driven emission must reproduce
    // the batch-flush answer exactly)
    "q_stream_session_state" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sess AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        |  FROM flagged)
        |SELECT user_id, count(*) AS n_events,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS sess_end,
        |  round(sum(value), 2) AS sum_v
        |FROM sess GROUP BY user_id, sess_id
        |HAVING user_id <= 100
        |ORDER BY user_id, sess_start""".stripMargin
  )
}
