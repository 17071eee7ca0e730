package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Joins
import graft.syntax._
import QueryDsl._

/** Keyed/pair operators (SURVEY §2 "Keyed / pair ops").
  * Reference semantics: scio-core PairSCollectionFunctions.scala,
  * PairHashSCollectionFunctions.scala, PairSkewedSCollectionFunctions
  * .scala. Join strategies live in graft.operators.Joins.
  */
object PairQueries extends QueryPack {

  override val queries: Map[String, Q] = Map(

    // plain shuffle join (Catalyst picks SMJ/shuffled-hash; dims
    // under the broadcast threshold flip to broadcast automatically).
    "q_join" -> { (s, dir) =>
      val t = tables(s, dir)
      t.supplier.join(t.nation, col("s_nationkey") === col("n_nationkey"))
        .filter(col("s_suppkey") <= 100)
        .select(col("s_suppkey"), col("s_name"), col("n_name"), r2(col("s_acctbal")).as("bal"))
        .orderBy(col("s_suppkey"))
    },

    // leftOuterJoin: customers with their order count, 0 if none.
    "q_left_join" -> { (s, dir) =>
      val t = tables(s, dir)
      val cnt = t.orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("n_raw"))
      t.customer.join(cnt, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), coalesce(col("n_raw"), lit(0L)).as("n_orders"))
        .filter(col("c_custkey") <= 300)
        .orderBy(col("c_custkey"))
    },

    // rightOuterJoin.
    "q_right_join" -> { (s, dir) =>
      val t = tables(s, dir)
      val bigOrders = t.orders.filter(col("o_totalprice") > 450000.0)
      bigOrders.join(t.customer.filter(col("c_custkey") <= 500),
          col("o_custkey") === col("c_custkey"), "right")
        .select(col("c_custkey"),
          coalesce(col("o_orderkey"), lit(-1L)).as("o_key"),
          r2(coalesce(col("o_totalprice"), lit(0.0))).as("total"))
        .orderBy(col("c_custkey"), col("o_key"))
    },

    // fullOuterJoin with nulls on both sides.
    "q_full_join" -> { (s, dir) =>
      val t = tables(s, dir)
      val a = t.customer.filter(col("c_acctbal") > 9000.0).select(col("c_custkey").as("k"), r2(col("c_acctbal")).as("bal"))
      val b = t.orders.filter(col("o_totalprice") > 450000.0)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big"))
      a.join(b, a("k") === b("o_custkey"), "full")
        .select(coalesce(col("k"), col("o_custkey")).as("custkey"),
          r2(coalesce(col("bal"), lit(-1.0))).as("bal"),
          coalesce(col("n_big"), lit(0L)).as("n_big"))
        .orderBy(col("custkey"))
    },

    // cogroup: per key, sorted value lists from both sides.
    "q_cogroup" -> { (s, dir) =>
      val t = tables(s, dir)
      val ord = t.orders.filter(col("o_custkey") <= 50).select(col("o_custkey").as("k"), col("o_orderkey"))
      val cus = t.customer.filter(col("c_custkey") <= 50).select(col("c_custkey").as("k"), col("c_mktsegment"))
      Joins.cogroup(ord, cus, "k", "o_orderkey", "c_mktsegment")
        .select(col("k"),
          coalesce(array_join(col("o_orderkeys"), ","), lit("")).as("order_keys"),
          coalesce(array_join(col("c_mktsegments"), ","), lit("")).as("segments"))
        .orderBy(col("k"))
    },

    // MultiJoin.cogroup beyond SCollection's 4-side cap (reference
    // util/MultiJoin.scala goes to 22): five sides keyed by nation.
    "q_cogroup_multi" -> { (s, dir) =>
      val t = tables(s, dir)
      val cusB = t.customer.filter(col("c_mktsegment") === "BUILDING" && col("c_custkey") <= 200)
        .select(col("c_nationkey").as("k"), col("c_name").as("bld"))
      val cusA = t.customer.filter(col("c_mktsegment") === "AUTOMOBILE" && col("c_custkey") <= 200)
        .select(col("c_nationkey").as("k"), col("c_name").as("auto"))
      val sup = t.supplier.filter(col("s_suppkey") <= 40)
        .select(col("s_nationkey").as("k"), col("s_name").as("sup"))
      val nat = t.nation.select(col("n_nationkey").as("k"), col("n_name").as("nat"))
      val rich = t.customer.filter(col("c_acctbal") > 9000 && col("c_custkey") <= 200)
        .select(col("c_nationkey").as("k"), col("c_name").as("rich"))
      Joins.cogroupN(Seq((cusB, "bld"), (cusA, "auto"), (sup, "sup"),
          (nat, "nat"), (rich, "rich")), "k")
        .select(col("k"),
          coalesce(array_join(col("blds"), ","), lit("")).as("bld_names"),
          coalesce(array_join(col("autos"), ","), lit("")).as("auto_names"),
          coalesce(array_join(col("sups"), ","), lit("")).as("sup_names"),
          coalesce(array_join(col("nats"), ","), lit("")).as("nat_names"),
          coalesce(array_join(col("richs"), ","), lit("")).as("rich_names"))
        .orderBy(col("k"))
    },

    // hashJoin: explicit broadcast of the small side.
    "q_hash_join" -> { (s, dir) =>
      val t = tables(s, dir)
      t.customer.hashJoin(t.nation, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_cust"), sumMoney(dec(col("c_acctbal"))).as("sum_bal"))
        .orderBy(col("n_name"))
    },

    // skewedJoin: salted fanout — same rows as the plain join.
    "q_skewed_join" -> { (s, dir) =>
      val t = tables(s, dir)
      t.lineitem.select(col("l_suppkey"), col("l_quantity"))
        .skewedJoin(t.supplier.select(col("s_suppkey").as("l_suppkey"), col("s_nationkey")), Seq("l_suppkey"), fanout = 8)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), r2(sum(col("l_quantity"))).as("qty"))
        .orderBy(col("s_nationkey"))
    },

    // skewedJoinSampled: scio's real skewedJoin shape — sampled hot-key
    // detection, fanout only for hot keys, cold keys join plain.
    // Same rows as the plain join regardless of what the sample marks hot.
    "q_skewed_split" -> { (s, dir) =>
      val t = tables(s, dir)
      Joins.skewedJoinSampled(
          t.lineitem.select(col("l_suppkey"), col("l_extendedprice")),
          t.supplier.select(col("s_suppkey").as("l_suppkey"), col("s_nationkey")),
          Seq("l_suppkey"), fanout = 8, hotKeyThreshold = 200L, sampleFraction = 0.2)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), sumMoney(dec(col("l_extendedprice"))).as("price"))
        .orderBy(col("s_nationkey"))
    },

    // skewedJoinCms: same join, hot/cold split via a Count-Min sketch
    // as a map-side codegen filter (no hot-key frame, no broadcast
    // probes). Same plain-join oracle as q_skewed_split.
    "q_skewed_cms" -> { (s, dir) =>
      val t = tables(s, dir)
      Joins.skewedJoinCms(
          t.lineitem.select(col("l_suppkey"), col("l_extendedprice")),
          t.supplier.select(col("s_suppkey").as("l_suppkey"), col("s_nationkey")),
          Seq("l_suppkey"), fanout = 8, hotKeyThreshold = 200L)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), sumMoney(dec(col("l_extendedprice"))).as("price"))
        .orderBy(col("s_nationkey"))
    },

    // sparseJoin: Bloom-prefiltered shuffle join.
    "q_sparse_join" -> { (s, dir) =>
      val t = tables(s, dir)
      val rareParts = t.part.filter(col("p_size") === 1).select(col("p_partkey").as("l_partkey"), col("p_brand"))
      t.lineitem.select(col("l_partkey"), col("l_quantity"))
        .sparseJoin(rareParts, "l_partkey", expectedRightKeys = 100000L)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), r2(sum(col("l_quantity"))).as("qty"))
        .orderBy(col("p_brand"))
    },

    // sparseLookup: Bloom over the (small) left key set prefilters the
    // big right side before its group-shuffle; each left row gets the
    // sorted list of right values (empty when none).
    "q_sparse_lookup" -> { (s, dir) =>
      val t = tables(s, dir)
      val probesIds = t.customer.filter(col("c_custkey") <= 50)
        .select(col("c_custkey").as("o_custkey"), col("c_name"))
      probesIds.sparseLookup(
          t.orders.select(col("o_custkey"), col("o_orderkey")),
          "o_custkey", "o_orderkey", expectedLeftKeys = 1000L)
        .select(col("o_custkey").as("custkey"), col("c_name"),
          array_join(col("o_orderkeys"), ",").as("order_keys"))
        .orderBy(col("custkey"))
    },

    // sparseIntersectByKey: Bloom-prefiltered semi join.
    "q_sparse_semi" -> { (s, dir) =>
      val t = tables(s, dir)
      t.lineitem.select(col("l_partkey"), col("l_quantity"))
        .sparseIntersectByKey(
          t.part.filter(col("p_size") === 1).select(col("p_partkey").as("l_partkey")),
          "l_partkey", expectedRightKeys = 100000L)
        .agg(count(lit(1)).as("n"), r2(sum(col("l_quantity"))).as("qty"))
    },

    // hashFilter: keep rows whose key is in the broadcast side set.
    "q_hash_filter" -> { (s, dir) =>
      val t = tables(s, dir)
      t.orders.hashFilter(
          t.customer.filter(col("c_mktsegment") === "BUILDING")
            .select(col("c_custkey").as("o_custkey")),
          "o_custkey")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sumMoney(dec(col("o_totalprice"))).as("total"))
        .orderBy(col("o_orderpriority"))
    },

    // asofJoin: per click, the latest purchase value at-or-before it —
    // union + one keyed window pass (never an inequality range join);
    // DuckDB's native ASOF JOIN is the oracle.
    "q_asof_join" -> { (s, dir) =>
      val ev = tables(s, dir).events
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts").as("p_ts"))
        .agg(max(col("value")).as("last_purchase_value"))
      graft.operators.Temporal.asofJoin(clicks, purchases, "user_id", "ts", "p_ts",
          Seq("last_purchase_value"))
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
          r6(col("last_purchase_value")).as("last_purchase_value"))
        .orderBy(col("event_id"))
    },

    // asofJoinChunked: identical semantics to q_asof_join, with the
    // window keyed by (user, 1-hour time-chunk) and per-chunk seed
    // carry-forward — the hot-key spread variant, checked against the
    // same DuckDB ASOF oracle. Chunk units = seconds (timestamp ts).
    "q_asof_chunked" -> { (s, dir) =>
      val ev = tables(s, dir).events
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts").as("p_ts"))
        .agg(max(col("value")).as("last_purchase_value"))
      graft.operators.Temporal.asofJoinChunked(clicks, purchases, "user_id", "ts", "p_ts",
          Seq("last_purchase_value"), chunkSize = 3600L)
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
          r6(col("last_purchase_value")).as("last_purchase_value"))
        .orderBy(col("event_id"))
    },

    // intervalJoin: clicks landing inside any [error, error+2h] window,
    // bucketed equality join + exact containment filter (never an
    // open-ended range join); DuckDB runs the inequality join directly.
    "q_interval_join" -> { (s, dir) =>
      val ev = tables(s, dir).events
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"))
      val errWindows = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("w_end"))
      graft.operators.Temporal.intervalJoin(clicks, errWindows, "user_id",
          "ts", "w_start", "w_end")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("user_id"))
    },

    // interval-OVERLAP join (both sides intervals): view windows vs
    // error windows per user, canonical-bucket single-emission; exact
    // µs overlap mass per user.
    "q_interval_overlap" -> { (s, dir) =>
      val ev = tables(s, dir).events
      val views = ev.filter(col("event_type") === "view" && col("event_id") % 5 === 0)
        .select(col("user_id"), col("ts").as("v_start"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("v_end"))
      val errs = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("e_start"),
          (col("ts") + expr("INTERVAL 45 MINUTES")).as("e_end"))
      graft.operators.Temporal.intervalOverlapJoin(views, errs, "user_id",
          "v_start", "v_end", "e_start", "e_end", bucketSec = 900L)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(unix_micros(least(col("v_end"), col("e_end"))) -
            unix_micros(greatest(col("v_start"), col("e_start")))).as("overlap_us"))
        .orderBy(col("user_id"))
    },

    // hashLookup: broadcast map lookup (side-input join).
    "q_hash_lookup" -> { (s, dir) =>
      val t = tables(s, dir)
      t.supplier.hashJoin(t.nation.select(col("n_nationkey"), col("n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).agg(count(lit(1)).as("n_supp"))
        .orderBy(col("n_name"))
    },

    // intersectByKey → left-semi: customers having ≥1 urgent order.
    "q_semi_join" -> { (s, dir) =>
      val t = tables(s, dir)
      t.customer.intersectByKey(
          t.orders.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("c_custkey")),
          "c_custkey")
        .agg(count(lit(1)).as("n"), sumMoney(dec(col("c_acctbal"))).as("sum_bal"))
    },

    // subtractByKey → left-anti: customers with no urgent orders.
    "q_anti_join" -> { (s, dir) =>
      val t = tables(s, dir)
      t.customer.subtractByKey(
          t.orders.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("c_custkey")),
          "c_custkey")
        .agg(count(lit(1)).as("n"), sumMoney(dec(col("c_acctbal"))).as("sum_bal"))
    },

    // reduceByKey/sumByKey (map-side partial agg).
    "q_sum_by_key" -> { (s, dir) =>
      tables(s, dir).events
        .groupBy(col("user_id"))
        .agg(r6(sum(dec(col("value")))).cast("double").as("sum_value"))
        .filter(col("user_id") <= 100)
        .orderBy(col("user_id"))
    },

    // aggregateByKey/combineByKey: multi-expression keyed aggregation.
    "q_aggregate_by_key" -> { (s, dir) =>
      tables(s, dir).events
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), r6(sum(dec(col("value")))).cast("double").as("sum_v"),
          r6(min(col("value"))).as("min_v"), r6(max(col("value"))).as("max_v"))
        .orderBy(col("event_type"))
    },

    // countByKey.
    "q_count_by_key" -> { (s, dir) =>
      tables(s, dir).lineitem
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_lines"))
        .filter(col("l_orderkey") <= 200)
        .orderBy(col("l_orderkey"))
    },

    // minByKey/maxByKey: argmin/argmax per key — TIE-DETERMINISTIC via
    // lexicographic struct min/max (price, then orderkey). min_by/
    // max_by pick an arbitrary row among tied extremes, which is fine
    // until the data actually has ties — at 10× replication (and on
    // any real corpus) it does, and the sf1 gate caught the ambiguity.
    "q_min_max_by_key" -> { (s, dir) =>
      tables(s, dir).orders
        .groupBy(col("o_orderpriority"))
        .agg(
          min(struct(col("o_totalprice"), col("o_orderkey")))
            .getField("o_orderkey").as("cheapest_order"),
          max(struct(col("o_totalprice"), col("o_orderkey")))
            .getField("o_orderkey").as("priciest_order"),
          r2(min(col("o_totalprice"))).as("min_total"),
          r2(max(col("o_totalprice"))).as("max_total"))
        .orderBy(col("o_orderpriority"))
    },

    // meanByKey.
    "q_mean_by_key" -> { (s, dir) =>
      tables(s, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(r6(avg(col("l_discount"))).as("avg_disc"))
        .orderBy(col("l_returnflag"))
    },

    // latestByKey via max_by over event time.
    "q_latest_by_key" -> { (s, dir) =>
      tables(s, dir).events
        .latestByKey(Seq("event_type"), "ts", "value")
        .select(col("event_type"), r6(col("latest_value")).as("latest_value"),
          date_format(col("max_ts"), "yyyy-MM-dd HH:mm:ss").as("latest_ts"))
        .orderBy(col("event_type"))
    },

    // topByKey: bounded per-key rank, one shuffle, no global sort.
    "q_top_by_key" -> { (s, dir) =>
      tables(s, dir).orders
        .topByKey(Seq("o_orderpriority"), 3, col("o_totalprice").desc, col("o_orderkey").asc)
        .select(col("o_orderpriority"), col("o_orderkey"), r2(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderpriority"), col("total").desc, col("o_orderkey"))
    },

    // approxQuantilesByKey's exact core, per key.
    "q_quantiles_by_key" -> { (s, dir) =>
      tables(s, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(percentile(col("l_extendedprice"), lit(0.5)).as("med_raw"))
        .select(col("l_returnflag"), r6(col("med_raw")).as("median_price"))
        .orderBy(col("l_returnflag"))
    },

    // mapValues/swap: value-side projection keeping the key.
    "q_map_values" -> { (s, dir) =>
      tables(s, dir).events
        .filter(col("event_id") < 50)
        .select(col("event_id"), col("event_type"))
        .swapped
        .select(col("event_type"), col("event_id"))
        .orderBy(col("event_id"))
    },

    // withHotKeyFanout: two-phase salted aggregation ≡ plain agg.
    "q_fanout_agg" -> { (s, dir) =>
      Joins.fanoutAgg(tables(s, dir).lineitem, Seq("l_returnflag"), fanout = 8)(
          partial = Seq(sum(col("l_quantity")).as("part_qty"), count(lit(1)).as("part_n")),
          merge = Seq(r2(sum(col("part_qty"))).as("sum_qty"), sum(col("part_n")).as("n")))
        .orderBy(col("l_returnflag"))
    }
  )

  override val oracles: Map[String, String] = Map(
    "q_join" ->
      """SELECT s_suppkey, s_name, n_name, round(s_acctbal, 2) AS bal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey <= 100 ORDER BY s_suppkey""".stripMargin,
    "q_left_join" ->
      """SELECT c_custkey, coalesce(n_raw, 0) AS n_orders
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, count(*) AS n_raw FROM orders GROUP BY o_custkey
        |) ON c_custkey = o_custkey
        |WHERE c_custkey <= 300 ORDER BY c_custkey""".stripMargin,
    "q_right_join" ->
      """SELECT c_custkey, coalesce(o_orderkey, -1) AS o_key,
        |  round(coalesce(o_totalprice, 0.0), 2) AS total
        |FROM (SELECT * FROM orders WHERE o_totalprice > 450000.0) o
        |RIGHT JOIN (SELECT * FROM customer WHERE c_custkey <= 500) c
        |  ON o.o_custkey = c.c_custkey
        |ORDER BY c_custkey, o_key""".stripMargin,
    "q_full_join" ->
      """SELECT coalesce(k, o_custkey) AS custkey,
        |  round(coalesce(bal, -1.0), 2) AS bal,
        |  coalesce(n_big, 0) AS n_big
        |FROM (SELECT c_custkey AS k, round(c_acctbal, 2) AS bal FROM customer WHERE c_acctbal > 9000.0) a
        |FULL JOIN (SELECT o_custkey, count(*) AS n_big FROM orders
        |           WHERE o_totalprice > 450000.0 GROUP BY o_custkey) b
        |  ON a.k = b.o_custkey
        |ORDER BY custkey""".stripMargin,
    "q_cogroup" ->
      """SELECT coalesce(o.k, c.k) AS k,
        |  coalesce(o.order_keys, '') AS order_keys,
        |  coalesce(c.segments, '') AS segments
        |FROM (SELECT o_custkey AS k,
        |        string_agg(o_orderkey::VARCHAR, ',' ORDER BY o_orderkey) AS order_keys
        |      FROM orders WHERE o_custkey <= 50 GROUP BY o_custkey) o
        |FULL JOIN (SELECT c_custkey AS k,
        |        string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
        |      FROM customer WHERE c_custkey <= 50 GROUP BY c_custkey) c
        |  ON o.k = c.k
        |ORDER BY k""".stripMargin,
    "q_cogroup_multi" ->
      """WITH b AS (SELECT c_nationkey AS k, string_agg(c_name, ',' ORDER BY c_name) AS bld_names
        |  FROM customer WHERE c_mktsegment = 'BUILDING' AND c_custkey <= 200 GROUP BY 1),
        |a AS (SELECT c_nationkey AS k, string_agg(c_name, ',' ORDER BY c_name) AS auto_names
        |  FROM customer WHERE c_mktsegment = 'AUTOMOBILE' AND c_custkey <= 200 GROUP BY 1),
        |s AS (SELECT s_nationkey AS k, string_agg(s_name, ',' ORDER BY s_name) AS sup_names
        |  FROM supplier WHERE s_suppkey <= 40 GROUP BY 1),
        |n AS (SELECT n_nationkey AS k, string_agg(n_name, ',' ORDER BY n_name) AS nat_names
        |  FROM nation GROUP BY 1),
        |r AS (SELECT c_nationkey AS k, string_agg(c_name, ',' ORDER BY c_name) AS rich_names
        |  FROM customer WHERE c_acctbal > 9000 AND c_custkey <= 200 GROUP BY 1)
        |SELECT coalesce(b.k, a.k, s.k, n.k, r.k) AS k,
        |  coalesce(bld_names, '') AS bld_names, coalesce(auto_names, '') AS auto_names,
        |  coalesce(sup_names, '') AS sup_names, coalesce(nat_names, '') AS nat_names,
        |  coalesce(rich_names, '') AS rich_names
        |FROM b FULL JOIN a ON b.k = a.k FULL JOIN s ON coalesce(b.k, a.k) = s.k
        |FULL JOIN n ON coalesce(b.k, a.k, s.k) = n.k
        |FULL JOIN r ON coalesce(b.k, a.k, s.k, n.k) = r.k
        |ORDER BY k""".stripMargin,
    "q_hash_join" ->
      """SELECT n_name, count(*) AS n_cust, CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_skewed_join" ->
      """SELECT s_nationkey, count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q_skewed_split" ->
      """SELECT s_nationkey, count(*) AS n, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS price
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q_skewed_cms" ->
      """SELECT s_nationkey, count(*) AS n, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS price
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q_sparse_join" ->
      """SELECT p_brand, count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size = 1
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_sparse_lookup" ->
      """SELECT c.c_custkey AS custkey, c.c_name,
        |  coalesce(o.order_keys, '') AS order_keys
        |FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 50) c
        |LEFT JOIN (SELECT o_custkey,
        |        string_agg(o_orderkey::VARCHAR, ',' ORDER BY o_orderkey) AS order_keys
        |      FROM orders GROUP BY o_custkey) o
        |  ON c.c_custkey = o.o_custkey
        |ORDER BY custkey""".stripMargin,
    "q_sparse_semi" ->
      """SELECT count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem WHERE l_partkey IN (
        |  SELECT p_partkey FROM part WHERE p_size = 1)""".stripMargin,
    "q_hash_filter" ->
      """SELECT o_orderpriority, count(*) AS n, CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
        |FROM orders WHERE o_custkey IN (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_asof_join" ->
      """SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
        |  round(p.last_purchase_value, 6) AS last_purchase_value
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (
        |    SELECT user_id, ts AS p_ts, max(value) AS last_purchase_value
        |    FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts) p
        |  ON c.user_id = p.user_id AND c.ts >= p.p_ts
        |ORDER BY c.event_id""".stripMargin,
    "q_asof_chunked" ->
      """SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
        |  round(p.last_purchase_value, 6) AS last_purchase_value
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (
        |    SELECT user_id, ts AS p_ts, max(value) AS last_purchase_value
        |    FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts) p
        |  ON c.user_id = p.user_id AND c.ts >= p.p_ts
        |ORDER BY c.event_id""".stripMargin,
    "q_interval_join" ->
      """SELECT c.user_id, count(*) AS n_pairs
        |FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
        |JOIN (SELECT user_id, ts AS w_start, ts + INTERVAL 2 HOUR AS w_end
        |      FROM events WHERE event_type = 'error') w
        |  ON c.user_id = w.user_id AND c.ts >= w.w_start AND c.ts <= w.w_end
        |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin,
    "q_interval_overlap" ->
      """SELECT v.user_id, count(*) AS n_pairs,
        |  CAST(sum(epoch_us(least(v_end, e_end)) -
        |    epoch_us(greatest(v_start, e_start))) AS BIGINT) AS overlap_us
        |FROM (SELECT user_id, ts AS v_start, ts + INTERVAL 30 MINUTE AS v_end
        |      FROM events WHERE event_type = 'view' AND event_id % 5 = 0) v
        |JOIN (SELECT user_id, ts AS e_start, ts + INTERVAL 45 MINUTE AS e_end
        |      FROM events WHERE event_type = 'error') e
        |  ON v.user_id = e.user_id AND v_start <= e_end AND e_start <= v_end
        |GROUP BY v.user_id ORDER BY v.user_id""".stripMargin,
    "q_hash_lookup" ->
      """SELECT n_name, count(*) AS n_supp
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_semi_join" ->
      """SELECT count(*) AS n, CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_bal
        |FROM customer WHERE EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin,
    "q_anti_join" ->
      """SELECT count(*) AS n, CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_bal
        |FROM customer WHERE NOT EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin,
    "q_sum_by_key" ->
      """SELECT user_id, CAST(round(sum(CAST(value AS DECIMAL(12,2))), 6) AS DOUBLE) AS sum_value
        |FROM events GROUP BY user_id HAVING user_id <= 100
        |ORDER BY user_id""".stripMargin,
    "q_aggregate_by_key" ->
      """SELECT event_type, count(*) AS n, CAST(round(sum(CAST(value AS DECIMAL(12,2))), 6) AS DOUBLE) AS sum_v,
        |  round(min(value), 6) AS min_v, round(max(value), 6) AS max_v
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_count_by_key" ->
      """SELECT l_orderkey, count(*) AS n_lines
        |FROM lineitem GROUP BY l_orderkey HAVING l_orderkey <= 200
        |ORDER BY l_orderkey""".stripMargin,
    "q_min_max_by_key" ->
      """SELECT o_orderpriority,
        |  struct_extract(min(struct_pack(p := o_totalprice, k := o_orderkey)), 'k') AS cheapest_order,
        |  struct_extract(max(struct_pack(p := o_totalprice, k := o_orderkey)), 'k') AS priciest_order,
        |  round(min(o_totalprice), 2) AS min_total,
        |  round(max(o_totalprice), 2) AS max_total
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_mean_by_key" ->
      """SELECT l_returnflag, round(avg(l_discount), 6) AS avg_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_latest_by_key" ->
      """SELECT event_type, round(max_by(value, ts), 6) AS latest_value,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS latest_ts
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_top_by_key" ->
      """SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS total
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_orderpriority
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_orderpriority, total DESC, o_orderkey""".stripMargin,
    "q_quantiles_by_key" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_map_values" ->
      """SELECT event_type, event_id FROM events
        |WHERE event_id < 50 ORDER BY event_id""".stripMargin,
    "q_fanout_agg" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
