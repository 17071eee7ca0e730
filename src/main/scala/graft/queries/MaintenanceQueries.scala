package graft.queries

import org.apache.spark.sql.functions._
import QueryDsl._

/** Table-maintenance, time-series, linkage, and graph/shape queries —
  * the r10 additions: MERGE upsert / CDC apply / SCD2 history
  * (operators.Merge), gap-fill / interval coalescing / EMA
  * (operators.TimeSeries), fuzzy record linkage (operators.Linkage),
  * triangle counting (operators.Graph), pivot/unpivot, and perceptual
  * image hashing (multimodal dHash + hamming near-dup).
  *
  * Every derived input is computed deterministically FROM the driver
  * tables (no synthesized randomness), so the DuckDB oracle can
  * reconstruct it exactly.
  */
object MaintenanceQueries extends QueryPack {

  override val queries: Map[String, Q] = Map(
    // MERGE upsert: updates replace matched orders, new keys append;
    // result audited as a per-status census (count + exact money sum).
    "q_merge_upsert" -> { (s, dir) =>
      val t = tables(s, dir)
      val base = t.orders
      val changedPrice = r2(dec(col("o_totalprice")) * lit("1.1").cast("decimal(3,1)"))
        .cast("double")
      val u1 = base.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", changedPrice)
      // "new key" shift derived from the DATA, not a constant: a fixed
      // +10M collided with real keys at sf10 (15M orders, keys to ~60M)
      // and correctly tripped upsert's source-uniqueness guard — the
      // recipe, not the operator, was the scale bug
      val keyShift = base.agg(max(col("o_orderkey")).cast("long")).head().getLong(0) + 1L
      val u2 = base.filter(col("o_orderkey") % 13 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(keyShift))
      val merged = graft.operators.Merge.upsert(base, u1.unionByName(u2), Seq("o_orderkey"))
      merged.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sumMoney(dec(col("o_totalprice"))).as("total"))
        .orderBy(col("o_orderstatus"))
    },

    // CDC batch apply: per-key latest change wins (seq 2 deletes beat
    // seq 1 updates), 'D' removes, 'I'/'U' upsert, new keys append.
    "q_cdc_apply" -> { (s, dir) =>
      val t = tables(s, dir)
      val base = t.orders
      val u = base.filter(col("o_orderkey") % 5 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(100.0))
        .withColumn("seq", lit(1L)).withColumn("op", lit("U"))
      val d = base.filter(col("o_orderkey") % 10 === 0)
        .withColumn("seq", lit(2L)).withColumn("op", lit("D"))
      // same data-derived shift as q_merge_upsert: a fixed +20M would
      // alias real keys at sf10 and silently turn inserts into updates
      val keyShift = base.agg(max(col("o_orderkey")).cast("long")).head().getLong(0) + 1L
      val i = base.filter(col("o_orderkey") % 11 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(keyShift))
        .withColumn("seq", lit(1L)).withColumn("op", lit("I"))
      val next = graft.operators.Merge.applyCdc(
        base, u.unionByName(d).unionByName(i), Seq("o_orderkey"), "seq", "op")
      next.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sumMoney(dec(col("o_totalprice"))).as("total"))
        .orderBy(col("o_orderstatus"))
    },

    // SCD Type 2 history from the per-user event-type change log:
    // run-compressed versions with [valid_from, valid_to) spans.
    "q_scd2" -> { (s, dir) =>
      val log = tables(s, dir).events
        .filter(col("user_id") % 13 === 0 && col("event_type").isNotNull)
        .select(col("user_id"), col("ts"), col("event_type"))
      graft.operators.Merge.scd2(log, Seq("user_id"), "ts")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("valid_from")).as("from_us"),
          unix_micros(col("valid_to")).as("to_us"), col("is_current"))
        .orderBy(col("user_id"), col("from_us"), col("event_type"))
    },

    // Fixed-grid resample (6h buckets, last observation per bucket)
    // with forward fill across empty buckets.
    "q_gap_fill" -> { (s, dir) =>
      val ev = tables(s, dir).events.filter(col("user_id") % 7 === 0)
      graft.operators.TimeSeries.gapFill(ev, "user_id", "ts", Seq("value"), 21600L)
        .select(col("user_id"), unix_seconds(col("ts")).as("ts_s"), col("value"))
        .orderBy(col("user_id"), col("ts_s"))
    },

    // Interval coalescing: per-user event intervals (deterministic
    // integer durations from event_id) merged where they overlap/abut.
    "q_interval_merge" -> { (s, dir) =>
      val iv = tables(s, dir).events.select(col("user_id"),
        unix_seconds(col("ts")).as("start_s"),
        (unix_seconds(col("ts")) + lit(600L) + pmod(col("event_id"), lit(3600L))).as("end_s"))
      graft.operators.TimeSeries.coalesceIntervals(iv, Seq("user_id"), "start_s", "end_s")
        .orderBy(col("user_id"), col("start_s"))
    },

    // EMA (alpha = 0.1) per user over (ts, event_id) order; the final
    // smoothed value per user (DuckDB list_reduce replays the exact
    // same IEEE fold, so 6-dp rounding is engine-stable).
    "q_ema" -> { (s, dir) =>
      val e = graft.operators.TimeSeries.ema(
        tables(s, dir).events.select(col("user_id"), col("ts"), col("event_id"), col("value")),
        "user_id", "ts", "value", alpha = 0.1, tieCols = Seq("event_id"))
      e.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          max(struct(col("ts"), col("event_id"), col("ema"))).as("__last"))
        .select(col("user_id"), col("n"), round(col("__last.ema"), 6).as("ema_last"))
        .orderBy(col("user_id"))
    },

    // Trailing 6h rolling stats per user (RANGE frame over event-time
    // microseconds — tie-deterministic by frame construction).
    "q_rolling" -> { (s, dir) =>
      val ev = tables(s, dir).events
        .filter(col("user_id") % 11 === 0)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      graft.operators.TimeSeries.rolling(ev, "user_id", "ts", "value", 21600L)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
          col("roll_n"), round(col("roll_sum"), 4).as("roll_sum"),
          round(col("roll_avg"), 6).as("roll_avg"),
          round(col("roll_min"), 4).as("roll_min"), round(col("roll_max"), 4).as("roll_max"))
        .orderBy(col("user_id"), col("ts_us"), col("event_id"))
    },

    // rollingChunked: identical semantics to q_rolling, with the
    // hot-key (key, time-chunk) window key — the chunk spread and the
    // out-of-chunk carry rows are on the critical path; the SAME
    // plain-window oracle pins that the chunked layout changes
    // nothing. chunkSec == windowSec: every row has at most one carry.
    "q_rolling_chunked" -> { (s, dir) =>
      val ev = tables(s, dir).events
        .filter(col("user_id") % 11 === 0)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      graft.operators.TimeSeries.rollingChunked(ev, "user_id", "ts", "value",
          windowSec = 21600L, chunkSec = 21600L)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
          col("roll_n"), round(col("roll_sum"), 4).as("roll_sum"),
          round(col("roll_avg"), 6).as("roll_avg"),
          round(col("roll_min"), 4).as("roll_min"), round(col("roll_max"), 4).as("roll_max"))
        .orderBy(col("user_id"), col("ts_us"), col("event_id"))
    },

    // Pivot: order-priority census per order status (explicit value
    // list → deterministic columns).
    "q_pivot" -> { (s, dir) =>
      tables(s, dir).orders
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .select(col("o_orderstatus"),
          coalesce(col("1-URGENT"), lit(0L)).as("p_urgent"),
          coalesce(col("2-HIGH"), lit(0L)).as("p_high"),
          coalesce(col("3-MEDIUM"), lit(0L)).as("p_medium"),
          coalesce(col("4-NOT SPECIFIED"), lit(0L)).as("p_notspec"),
          coalesce(col("5-LOW"), lit(0L)).as("p_low"))
        .orderBy(col("o_orderstatus"))
    },

    // Unpivot (melt): per-nation customer aggregates to long form.
    "q_unpivot" -> { (s, dir) =>
      tables(s, dir).customer
        .groupBy(col("c_nationkey"))
        .agg(sumMoney(dec(col("c_acctbal"))).as("acct_sum"),
          count(lit(1)).cast("double").as("acct_cnt"))
        .unpivot(Array(col("c_nationkey")),
          Array(col("acct_sum"), col("acct_cnt")), "metric", "value")
        .orderBy(col("c_nationkey"), col("metric"))
    },

    // Per-vertex triangle counts over a deterministic 60-vertex graph
    // derived from orders (degree-ordered wedge algorithm).
    "q_triangles" -> { (s, dir) =>
      val edges = tables(s, dir).orders
        .select((col("o_orderkey") % 60).as("a"), (col("o_custkey") % 60).as("b"))
      graft.operators.Graph.triangleCount(edges, "a", "b")
        .orderBy(col("vertex"))
    },

    // Connected components over a deterministic BLOCK-BOUNDED graph
    // from urgent orders: left vertex a ∈ [0,5000); right vertex in
    // a's 5-wide block, so every component stays ≤10 vertices and the
    // oracle's recursive-CTE transitive closure (min reachable id =
    // the same canonical label connectedComponents converges to)
    // stays cheap at every scale factor.
    "q_connected_components" -> { (s, dir) =>
      val a = col("o_orderkey") % 5000
      val b = lit(5000L) + (a - (a % 5)) + (col("o_custkey") % 5)
      val edges = tables(s, dir).orders
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(a.as("a"), b.as("b"))
      graft.operators.Graph.connectedComponents(edges, "a", "b", maxIters = 12)
        .select(col("vertex"), col("component"))
        .orderBy(col("vertex"))
    },

    // k-core over the deterministic order graph: iterative peeling to
    // the unique fixpoint; the oracle unrolls the SAME peeling as
    // fixed-depth nested CTEs (depth validated by the hash match —
    // a deeper-than-unrolled cascade would mismatch loudly).
    "q_kcore" -> { (s, dir) =>
      val edges = tables(s, dir).orders
        .select((col("o_orderkey") % 2000).as("a"), (col("o_custkey") % 2000).as("b"))
      graft.operators.Graph.kCore(edges, "a", "b", k = 8, maxIters = 30)
        .orderBy(col("vertex"))
    },

    // deterministic synchronous label propagation (4 rounds, min-label
    // ties): communities over the order graph; the oracle unrolls the
    // same rounds with window-ranked argmax.
    "q_label_prop" -> { (s, dir) =>
      val edges = tables(s, dir).orders
        .select((col("o_orderkey") % 300).as("a"), (col("o_custkey") % 300).as("b"))
      graft.operators.Graph.labelPropagation(edges, "a", "b", iters = 4)
        .orderBy(col("vertex"))
    },

    // bounded-hop BFS distances from two landmark vertices: pure
    // integer min-relaxation, oracle unrolls the same rounds.
    "q_shortest_paths" -> { (s, dir) =>
      val edges = tables(s, dir).orders
        .select((col("o_orderkey") % 300).as("a"), (col("o_custkey") % 300).as("b"))
      graft.operators.Graph.shortestPaths(edges, "a", "b",
          landmarks = Seq(0L, 7L), maxHops = 4)
        .orderBy(col("vertex"), col("landmark"))
    },

    // Fuzzy record linkage: near-matching part names (distinct),
    // blocked on the last token, Levenshtein <= 4.
    "q_fuzzy_match" -> { (s, dir) =>
      val names = tables(s, dir).part.select(col("p_name")).distinct()
      graft.operators.Linkage.fuzzyPairs(names, "p_name", "p_name", maxDist = 4,
          blocker = c => element_at(split(c, " "), -1))
        .select(col("id_a").as("name_a"), col("id_b").as("name_b"), col("dist"))
        .orderBy(col("name_a"), col("name_b"))
    },

    // Perceptual image hash: REAL PNG encode → ImageIO decode → dHash
    // on the critical path; the oracle recomputes every gradient bit
    // from the deterministic pattern formula.
    "q_image_hash" -> { (s, dir) =>
      val m = graft.multimodal.Multimodal
      val docs = tables(s, dir).documents.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), col("doc_id").as("pat"), lit(0).as("bump"))
      m.dHashes(m.syntheticPatternImages(docs, "doc_id", "pat", "bump"))
        .filter(col("decoded"))
        .select(col("id").as("doc_id"), col("dhash"))
        .orderBy(col("doc_id"))
    },

    // Image near-dup: base images + one-pixel-perturbed twins; pairs
    // within hamming 3 via chunk-blocked hammingPairs (pigeonhole ⇒
    // blocking is exhaustive at maxDist 3, so the blocked result
    // EQUALS the oracle's all-pairs scan; the cap is set above any
    // chunk population this corpus can produce so it never engages —
    // its behavior is pinned separately in DedupSpec).
    "q_image_dedup" -> { (s, dir) =>
      val m = graft.multimodal.Multimodal
      val d = tables(s, dir).documents.filter(col("doc_id") % 20 === 0)
      val base = d.select(col("doc_id").as("rid"), col("doc_id").as("pat"), lit(0).as("bump"))
      val twin = d.select((col("doc_id") + 1000000L).as("rid"),
        col("doc_id").as("pat"), lit(1).as("bump"))
      val sigs = m.dHashes(m.syntheticPatternImages(base.unionByName(twin),
          "rid", "pat", "bump"))
        .filter(col("decoded")).select(col("id"), col("dhash"))
      graft.dedup.Dedup.hammingPairs(sigs, "id", "dhash", maxDist = 3, maxBucket = 1000000)
        .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
        .orderBy(col("id_a"), col("id_b"))
    }
  )

  override val oracles: Map[String, String] = Map(
    "q_merge_upsert" ->
      """WITH u AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CAST(round(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(1.1 AS DECIMAL(3,1)), 2) AS DOUBLE) AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey + (SELECT CAST(max(o_orderkey) AS BIGINT) + 1 FROM orders),
        |    o_custkey, o_orderstatus, o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 13 = 0),
        |m AS (
        |  SELECT * FROM u
        |  UNION ALL
        |  SELECT t.* FROM orders t ANTI JOIN u ON t.o_orderkey = u.o_orderkey)
        |SELECT o_orderstatus, count(*) AS n,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cdc_apply" ->
      """WITH c AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 100.0 AS o_totalprice,
        |    o_orderdate, o_orderpriority, 1 AS seq, 'U' AS op
        |  FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |    o_orderdate, o_orderpriority, 2, 'D'
        |  FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey + (SELECT CAST(max(o_orderkey) AS BIGINT) + 1 FROM orders),
        |    o_custkey, o_orderstatus, o_totalprice,
        |    o_orderdate, o_orderpriority, 1, 'I'
        |  FROM orders WHERE o_orderkey % 11 = 0),
        |latest AS (
        |  SELECT * FROM (SELECT *, row_number() OVER (
        |      PARTITION BY o_orderkey ORDER BY seq DESC, op DESC) AS rn FROM c)
        |  WHERE rn = 1),
        |m AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
        |    o_orderpriority
        |  FROM latest WHERE op <> 'D'
        |  UNION ALL
        |  SELECT t.* FROM orders t ANTI JOIN latest l ON t.o_orderkey = l.o_orderkey)
        |SELECT o_orderstatus, count(*) AS n,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_scd2" ->
      """WITH log AS (
        |  SELECT user_id, ts, event_type FROM events
        |  WHERE user_id % 13 = 0 AND event_type IS NOT NULL),
        |v AS (
        |  SELECT user_id, ts, event_type FROM (
        |    SELECT *, lag(event_type) OVER (
        |        PARTITION BY user_id ORDER BY ts, event_type) AS prev FROM log)
        |  WHERE prev IS NULL OR prev <> event_type),
        |h AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS from_us,
        |    epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type)) AS to_us
        |  FROM v)
        |SELECT user_id, event_type, from_us, to_us, (to_us IS NULL) AS is_current
        |FROM h ORDER BY user_id, from_us, event_type""".stripMargin,
    "q_gap_fill" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 1000000 AS s, epoch_us(ts) AS us, value
        |  FROM events WHERE user_id % 7 = 0),
        |b AS (
        |  SELECT user_id, (s // 21600) * 21600 AS bkt, value,
        |    row_number() OVER (PARTITION BY user_id, s // 21600
        |      ORDER BY us DESC, value DESC) AS rn
        |  FROM e),
        |sampled AS (SELECT user_id, bkt, value FROM b WHERE rn = 1),
        |spans AS (SELECT user_id, min(bkt) AS lo, max(bkt) AS hi FROM sampled GROUP BY 1),
        |grid AS (SELECT user_id, unnest(generate_series(lo, hi, 21600)) AS bkt FROM spans),
        |f AS (
        |  SELECT g.user_id, g.bkt,
        |    last_value(s.value IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.bkt
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
        |  FROM grid g LEFT JOIN sampled s ON g.user_id = s.user_id AND g.bkt = s.bkt)
        |SELECT user_id, bkt AS ts_s, value FROM f ORDER BY user_id, ts_s""".stripMargin,
    "q_interval_merge" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts) // 1000000 AS start_s,
        |    epoch_us(ts) // 1000000 + 600 + (event_id % 3600) AS end_s
        |  FROM events),
        |m AS (
        |  SELECT user_id, start_s, end_s,
        |    CASE WHEN max(end_s) OVER w IS NULL
        |      OR start_s > max(end_s) OVER w THEN 1 ELSE 0 END AS newg
        |  FROM iv
        |  WINDOW w AS (PARTITION BY user_id ORDER BY start_s, end_s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |g AS (
        |  SELECT *, sum(newg) OVER (PARTITION BY user_id ORDER BY start_s, end_s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM m)
        |SELECT user_id, min(start_s) AS start_s, max(end_s) AS end_s,
        |  count(*) AS n_merged
        |FROM g GROUP BY user_id, grp ORDER BY user_id, start_s""".stripMargin,
    "q_ema" ->
      """SELECT user_id, count(*) AS n,
        |  round(list_reduce(list(value ORDER BY ts, event_id),
        |    (acc, x) -> 0.1 * x + 0.9 * acc), 6) AS ema_last
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_rolling" ->
      """SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |  count(value) OVER w AS roll_n,
        |  round(sum(value) OVER w, 4) AS roll_sum,
        |  round(avg(value) OVER w, 6) AS roll_avg,
        |  round(min(value) OVER w, 4) AS roll_min,
        |  round(max(value) OVER w, 4) AS roll_max
        |FROM events WHERE user_id % 11 = 0
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 21599999999 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts_us, event_id""".stripMargin,
    "q_rolling_chunked" ->
      """SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |  count(value) OVER w AS roll_n,
        |  round(sum(value) OVER w, 4) AS roll_sum,
        |  round(avg(value) OVER w, 6) AS roll_avg,
        |  round(min(value) OVER w, 4) AS roll_min,
        |  round(max(value) OVER w, 4) AS roll_max
        |FROM events WHERE user_id % 11 = 0
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 21599999999 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts_us, event_id""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderstatus,
        |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p_urgent,
        |  count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p_high,
        |  count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p_medium,
        |  count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p_notspec,
        |  count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p_low
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_unpivot" ->
      """WITH a AS (
        |  SELECT c_nationkey,
        |    CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS acct_sum,
        |    CAST(count(*) AS DOUBLE) AS acct_cnt
        |  FROM customer GROUP BY 1)
        |SELECT c_nationkey, 'acct_sum' AS metric, acct_sum AS value FROM a
        |UNION ALL
        |SELECT c_nationkey, 'acct_cnt' AS metric, acct_cnt AS value FROM a
        |ORDER BY c_nationkey, metric""".stripMargin,
    "q_triangles" ->
      """WITH e AS (
        |  SELECT DISTINCT least(o_orderkey % 60, o_custkey % 60) AS lo,
        |    greatest(o_orderkey % 60, o_custkey % 60) AS hi
        |  FROM orders WHERE o_orderkey % 60 <> o_custkey % 60),
        |t AS (
        |  SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
        |  FROM e e1 JOIN e e2 ON e1.hi = e2.lo
        |  JOIN e e3 ON e3.lo = e1.lo AND e3.hi = e2.hi),
        |verts AS (SELECT lo AS v FROM e UNION SELECT hi FROM e),
        |pc AS (
        |  SELECT x AS vertex, count(*) AS triangles FROM (
        |    SELECT a AS x FROM t UNION ALL SELECT b FROM t UNION ALL SELECT c FROM t)
        |  GROUP BY 1)
        |SELECT verts.v AS vertex, coalesce(pc.triangles, 0) AS triangles
        |FROM verts LEFT JOIN pc ON verts.v = pc.vertex ORDER BY 1""".stripMargin,
    "q_kcore" -> {
      // unrolled peeling rounds; a real cascade deeper than this
      // fails the gate loudly rather than silently agreeing
      val rounds = 10
      val peel = (1 to rounds).map { i =>
        s"""d$i AS MATERIALIZED (SELECT v, count(*) AS d FROM g$i GROUP BY 1),
           |k$i AS MATERIALIZED (SELECT v FROM d$i WHERE d >= 8),
           |g${i + 1} AS MATERIALIZED (
           |  SELECT g.v, g.n FROM g$i g
           |  JOIN k$i ka ON g.v = ka.v JOIN k$i kb ON g.n = kb.v)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (
         |  SELECT DISTINCT o_orderkey % 2000 AS a, o_custkey % 2000 AS b
         |  FROM orders WHERE o_orderkey % 2000 <> o_custkey % 2000),
         |g1 AS MATERIALIZED (SELECT a AS v, b AS n FROM e0 UNION SELECT b, a FROM e0),
         |$peel
         |SELECT v AS vertex, count(*) AS core_degree FROM g${rounds + 1}
         |GROUP BY 1 HAVING count(*) >= 8 ORDER BY 1""".stripMargin
    },
    "q_shortest_paths" -> {
      val rounds = (1 to 4).map { i =>
        s"""d$i AS MATERIALIZED (
           |  SELECT v, lm, min(d) AS d FROM (
           |    SELECT v, lm, d FROM d${i - 1}
           |    UNION ALL
           |    SELECT g.v, p.lm, p.d + 1 AS d
           |    FROM g g JOIN d${i - 1} p ON g.n = p.v)
           |  GROUP BY 1, 2)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS MATERIALIZED (
         |  SELECT DISTINCT o_orderkey % 300 AS a, o_custkey % 300 AS b
         |  FROM orders WHERE o_orderkey % 300 <> o_custkey % 300),
         |g AS MATERIALIZED (SELECT a AS v, b AS n FROM e0 UNION SELECT b, a FROM e0),
         |d0 AS MATERIALIZED (
         |  SELECT DISTINCT v, v AS lm, CAST(0 AS BIGINT) AS d FROM g WHERE v IN (0, 7)),
         |$rounds
         |SELECT v AS vertex, lm AS landmark, CAST(d AS BIGINT) AS distance
         |FROM d4 ORDER BY vertex, landmark""".stripMargin
    },
    "q_label_prop" -> {
      val rounds = (1 to 4).map { i =>
        s"""cnt$i AS MATERIALIZED (
           |  SELECT g.v, l.l, count(*) AS c
           |  FROM g g JOIN l${i - 1} l ON g.n = l.v GROUP BY 1, 2),
           |l$i AS MATERIALIZED (
           |  SELECT v, l FROM (
           |    SELECT v, l, row_number() OVER (PARTITION BY v
           |      ORDER BY c DESC, l ASC) AS rn FROM cnt$i)
           |  WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS MATERIALIZED (
         |  SELECT DISTINCT o_orderkey % 300 AS a, o_custkey % 300 AS b
         |  FROM orders WHERE o_orderkey % 300 <> o_custkey % 300),
         |g AS MATERIALIZED (SELECT a AS v, b AS n FROM e0 UNION SELECT b, a FROM e0),
         |l0 AS MATERIALIZED (SELECT DISTINCT v, v AS l FROM g),
         |$rounds
         |SELECT v AS vertex, l AS community FROM l4 ORDER BY vertex""".stripMargin
    },
    "q_connected_components" ->
      """WITH RECURSIVE e0 AS (
        |  SELECT DISTINCT o_orderkey % 5000 AS a,
        |    5000 + ((o_orderkey % 5000) - ((o_orderkey % 5000) % 5))
        |      + (o_custkey % 5) AS b
        |  FROM orders WHERE o_orderpriority = '1-URGENT'),
        |e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
        |verts AS (SELECT DISTINCT a AS v FROM e),
        |r AS (
        |  SELECT v, v AS c FROM verts
        |  UNION
        |  SELECT e.b AS v, r.c FROM r JOIN e ON e.a = r.v)
        |SELECT v AS vertex, min(c) AS component FROM r
        |GROUP BY v ORDER BY vertex""".stripMargin,
    "q_fuzzy_match" ->
      """WITH n AS (SELECT DISTINCT p_name FROM part),
        |b AS (SELECT p_name, split_part(p_name, ' ', 2) AS blk FROM n)
        |SELECT a.p_name AS name_a, c.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, c.p_name) AS INT) AS dist
        |FROM b a JOIN b c ON a.blk = c.blk AND a.p_name < c.p_name
        |WHERE levenshtein(a.p_name, c.p_name) <= 4
        |ORDER BY 1, 2""".stripMargin,
    "q_image_hash" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
        |bits AS (
        |  SELECT d.doc_id,
        |    sum(CASE WHEN ((doc_id*(x+2)*(y+3) + 7*(x+1) + 13*y) % 256) >
        |                 ((doc_id*(x+1)*(y+3) + 7*x + 13*y) % 256)
        |        THEN (1::HUGEINT << (y*8 + x)) ELSE 0::HUGEINT END) AS s
        |  FROM d, range(8) tx(x), range(8) ty(y)
        |  GROUP BY d.doc_id)
        |SELECT doc_id,
        |  CAST(CASE WHEN s >= 9223372036854775808 THEN s - 18446744073709551616
        |       ELSE s END AS BIGINT) AS dhash
        |FROM bits ORDER BY doc_id""".stripMargin,
    "q_image_dedup" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 20 = 0),
        |r AS (
        |  SELECT doc_id AS rid, doc_id AS pat, 0 AS bump FROM d
        |  UNION ALL
        |  SELECT doc_id + 1000000, doc_id, 1 FROM d),
        |bits AS (
        |  SELECT rid,
        |    sum(CASE WHEN ((pat*(x+2)*(y+3) + 7*(x+1) + 13*y) % 256) >
        |      ((pat*(x+1)*(y+3) + 7*x + 13*y +
        |        CASE WHEN x = 0 AND y = 0 THEN bump ELSE 0 END) % 256)
        |        THEN (1::HUGEINT << (y*8 + x)) ELSE 0::HUGEINT END) AS s
        |  FROM r, range(8) tx(x), range(8) ty(y)
        |  GROUP BY rid),
        |h AS (
        |  SELECT rid,
        |    CAST(CASE WHEN s >= 9223372036854775808 THEN s - 18446744073709551616
        |         ELSE s END AS BIGINT) AS dhash
        |  FROM bits)
        |SELECT a.rid AS id_a, b.rid AS id_b,
        |  CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
        |FROM h a JOIN h b ON a.rid < b.rid
        |WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
        |ORDER BY 1, 2""".stripMargin
  )
}
