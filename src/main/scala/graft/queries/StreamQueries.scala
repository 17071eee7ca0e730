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

  /** The real-time funnel tracker (flatMapGroupsWithState + event-time
    * timers, [[graft.streaming.StreamFunnel]]) through its REAL timer
    * path — emitOpen = false, so a step completion is emitted only once
    * the watermark passes its candidate time (watermark finality, not
    * arrival order). Sentinel-flushed like q_stream_session_state:
    * sentinel 1 advances the watermark past every real candidate AND
    * every horizon deadline, sentinel 2's batch fires the timers that
    * finalize (and horizon-expire) the state. Sentinel rows carry a
    * non-step event type, so they advance the watermark upstream but
    * never reach the funnel state.
    */
  private def streamFunnelOut(s: SparkSession, dir: String): String =
    staged("funnel", dir) { () =>
      val src = tmp(dir, "stream_funnel_src")
      val sent = tmp(dir, "stream_funnel_sent")
      val out = tmp(dir, "stream_funnel_out")
      val ckp = tmp(dir, "stream_funnel_ckp")
      wipe(src, sent, out, ckp)
      tables(s, dir).events
        .select(col("user_id").as("userId"), col("ts"),
          col("event_type").as("eventType"))
        .repartition(4).write.mode("overwrite").parquet(src)
      addSentinels(src, sent, tsLit => s.range(1).select(
        lit(-1L).as("userId"),
        to_timestamp(lit(tsLit)).as("ts"),
        lit("__sentinel").as("eventType")))
      import s.implicits._
      val schema = s.read.parquet(src).schema
      val ev = s.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        .withWatermark("ts", "40 days")
        .as[graft.streaming.FunnelEvent]
      val comps = graft.streaming.StreamFunnel.completions(
        ev, Seq("view", "click", "purchase"), withinSec = Some(86400L))
      val q = comps.toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckp)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      awaitOrFail(q, "q_stream_funnel")
      out
    }

  /** Streaming incremental near-dup ([[graft.streaming.StreamNearDup]]):
    * the historical corpus (doc_id % 3 != 0) shingles ONCE into the
    * persisted MinHash index; the new crawl — the q_dedup_incremental
    * corpus, scattered across 4 micro-batches — probes it per batch,
    * match tables land per batch dir. New-crawl ids are disjoint across
    * batches and each batch probes the full artifact, so the gathered
    * union must equal the batch operator's answer exactly (and the
    * XxhashOracle replays both sides' signatures in DuckDB).
    */
  private def streamNearDupOut(s: SparkSession, dir: String): String =
    staged("neardup", dir) { () =>
      val src = tmp(dir, "stream_nd_src")
      val idx = tmp(dir, "stream_nd_idx")
      val out = tmp(dir, "stream_nd_out")
      val ckp = tmp(dir, "stream_nd_ckp")
      wipe(src, idx, out, ckp)
      val docs = tables(s, dir).documents.select(col("doc_id"), col("text"))
      graft.dedup.Dedup.saveMinhashIndex(
        docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text", idx)
      docs.filter(col("doc_id") % 3 === 0)
        .union(docs.filter(col("doc_id") % 9 === 1)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        .repartition(4).write.mode("overwrite").parquet(src)
      val schema = s.read.parquet(src).schema
      val q = graft.streaming.StreamNearDup.againstIndex(
          s.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
          "doc_id", "text", idx, out, minEstJaccard = 0.5)
        .option("checkpointLocation", ckp)
        .trigger(Trigger.AvailableNow()).start()
      awaitOrFail(q, "q_stream_neardup")
      out
    }

  /** The streaming data-quality mirror ([[graft.streaming.StreamMonitor]]):
    * the q_expectations contracts ride the SAME pass as the query via
    * `observe()` — per-micro-batch row/violation counts surface in
    * StreamingQueryProgress.observedMetrics, and their totals across
    * every batch must equal the one-scan batch gate. The counts are
    * the distributed observe aggregates; only the final 4-row summary
    * is assembled driver-side (the monitoring-surface contract).
    */
  private def streamExpectOut(s: SparkSession, dir: String): String =
    staged("expect", dir) { () =>
      val src = tmp(dir, "stream_exp_src")
      val out = tmp(dir, "stream_exp_out")
      val ckp = tmp(dir, "stream_exp_ckp")
      wipe(src, out, ckp)
      tables(s, dir).orders
        .select(col("o_totalprice"), col("o_orderpriority"), col("o_orderdate"))
        .repartition(4).write.mode("overwrite").parquet(src)
      val schema = s.read.parquet(src).schema
      val names = Seq("positive_total", "priority_domain", "date_present",
        "total_under_200k")
      val preds = Seq(
        col("o_totalprice") > 0,
        col("o_orderpriority").isin(
          "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
        col("o_orderdate").isNotNull,
        col("o_totalprice") < 200000.0)
      val monitored = graft.streaming.StreamMonitor.withExpectations(
        s.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        names.zip(preds))
      val q = monitored.writeStream.format("noop")
        .option("checkpointLocation", ckp)
        .trigger(Trigger.AvailableNow()).start()
      awaitOrFail(q, "q_stream_expectations")
      // total the per-batch observed counts across every progress —
      // the alerting surface must reproduce the batch gate exactly
      val batchRows = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("graft_expectations")))
      val totals: Map[String, Long] = batchRows
        .flatMap { r =>
          r.schema.fieldNames.zipWithIndex.collect {
            case (f, i) if !r.isNullAt(i) => f -> r.getLong(i)
          }
        }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      val nRows = totals.getOrElse("n_rows", 0L)
      import s.implicits._
      names.map(n => (n, nRows, totals.getOrElse(s"viol_$n", 0L)))
        .toDF("expectation", "n_rows", "n_violations")
        .withColumn("pass", (col("n_violations") === 0L).cast("int"))
        .coalesce(1).write.mode("overwrite").parquet(out)
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
    },

    "q_stream_funnel" -> { (s, dir) =>
      s.read.parquet(streamFunnelOut(s, dir))
        .filter(col("userId") >= 0L)
        .select(col("userId").as("user_id"), col("stepIdx").as("step_idx"),
          col("step"), unix_micros(col("ts")).as("ts_us"))
        .orderBy(col("user_id"), col("step_idx"))
    },

    "q_stream_neardup" -> { (s, dir) =>
      s.read.parquet(streamNearDupOut(s, dir) + "/batch-*")
        .orderBy(col("id"), col("index_id"))
    },

    "q_stream_expectations" -> { (s, dir) =>
      s.read.parquet(streamExpectOut(s, dir))
        .select(col("expectation"), col("n_rows"), col("n_violations"), col("pass"))
        .orderBy(col("expectation"))
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
        |ORDER BY user_id, sess_start""".stripMargin,
    // the q_funnel_times chain (strict order, first-touch, 24h
    // horizon), reshaped as one row per COMPLETED step — the timer
    // path must emit exactly the steps the batch operator finalizes
    "q_stream_funnel" ->
      """WITH u1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1),
        |u2 AS (
        |  SELECT e.user_id, min(u1.t1) AS t1, min(e.ts) AS t2
        |  FROM events e JOIN u1 ON e.user_id = u1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > u1.t1
        |    AND e.ts <= u1.t1 + INTERVAL 86400 SECONDS
        |  GROUP BY 1),
        |u3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN u2 ON e.user_id = u2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > u2.t2
        |    AND e.ts <= u2.t1 + INTERVAL 86400 SECONDS
        |  GROUP BY 1)
        |SELECT user_id, CAST(1 AS INT) AS step_idx, 'view' AS step,
        |  epoch_us(t1) AS ts_us FROM u1
        |UNION ALL SELECT user_id, 2, 'click', epoch_us(t2) FROM u2
        |UNION ALL SELECT user_id, 3, 'purchase', epoch_us(t3) FROM u3
        |ORDER BY user_id, step_idx""".stripMargin,
    // the q_dedup_incremental oracle verbatim: the streamed new crawl
    // must reproduce the batch probe's matches exactly
    "q_stream_neardup" -> XxhashOracle.newVsIndex(),
    // the q_expectations oracle verbatim: summed per-batch observe
    // counts must equal the one-scan batch gate
    "q_stream_expectations" ->
      """WITH t AS (SELECT count(*) AS n FROM orders),
        |e AS (
        |  SELECT 'positive_total' AS expectation,
        |    count(*) FILTER (WHERE NOT coalesce(o_totalprice > 0, FALSE)) AS v
        |  FROM orders
        |  UNION ALL SELECT 'priority_domain',
        |    count(*) FILTER (WHERE NOT coalesce(o_orderpriority IN
        |      ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'), FALSE))
        |  FROM orders
        |  UNION ALL SELECT 'date_present',
        |    count(*) FILTER (WHERE o_orderdate IS NULL) FROM orders
        |  UNION ALL SELECT 'total_under_200k',
        |    count(*) FILTER (WHERE NOT coalesce(o_totalprice < 200000.0, FALSE))
        |  FROM orders)
        |SELECT e.expectation, t.n AS n_rows, e.v AS n_violations,
        |  CAST(e.v = 0 AS INT) AS pass
        |FROM e CROSS JOIN t ORDER BY expectation""".stripMargin
  )
}
