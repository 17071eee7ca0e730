package graft.queries

import org.apache.spark.sql.functions._
import graft.syntax._
import QueryDsl._

/** Core SCollection verbs (SURVEY §2 "Core element-wise & global"),
  * each demonstrated over the test tables with a DuckDB oracle.
  * Reference semantics: scio-core values/SCollection.scala.
  */
object CoreQueries extends QueryPack {

  override val queries: Map[String, Q] = Map(

    // map: projection with computed column (codegen'd, no shuffle).
    "q_map" -> { (s, dir) =>
      tables(s, dir).lineitem
        .filter(col("l_orderkey") < 100)
        // raw double product: a single IEEE multiply is bit-identical
        // across engines; round() is NOT (Spark rounds the shortest
        // decimal repr, DuckDB the binary value).
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // filter: predicate pushed to the parquet scan.
    "q_filter" -> { (s, dir) =>
      tables(s, dir).orders
        .filter(col("o_totalprice") > 400000.0 && col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_custkey"), r2(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderkey"))
    },

    // flatMap: one row → many (explode of tokenized text).
    "q_flatmap" -> { (s, dir) =>
      tables(s, dir).documents
        .filter(col("doc_id") < 10)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("token"))
    },

    // collect(pf): filter + transform fused.
    "q_collect" -> { (s, dir) =>
      tables(s, dir).events
        .filter(col("event_type") === "purchase" && col("value") > 90.0)
        .select(col("event_id"), (col("value") * 2.0).as("doubled"))
        .orderBy(col("event_id"))
    },

    // distinct over a projection.
    "q_distinct" -> { (s, dir) =>
      tables(s, dir).lineitem
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // distinctBy: deterministic representative per key (min tiebreak),
    // unlike dropDuplicates' arbitrary row.
    "q_distinct_by" -> { (s, dir) =>
      tables(s, dir).documents
        .distinctByMin(Seq("lang", "source"), "doc_id")
        .select(col("lang"), col("source"), col("doc_id"), col("n_chars"))
        .orderBy(col("lang"), col("source"))
    },

    // count / global aggregates in one pass.
    "q_global_agg" -> { (s, dir) =>
      tables(s, dir).lineitem.agg(
        count(lit(1)).as("n"),
        r2(sum(col("l_quantity"))).as("sum_qty"),
        r6(avg(col("l_quantity"))).as("avg_qty"),
        r2(min(col("l_extendedprice"))).as("min_price"),
        r2(max(col("l_extendedprice"))).as("max_price"))
    },

    // count: global size (distributed count, no collect).
    "q_count" -> { (s, dir) =>
      tables(s, dir).lineitem.agg(count(lit(1)).as("n"))
    },

    // countByValue.
    "q_count_by_value" -> { (s, dir) =>
      tables(s, dir).orders.countByValue("o_orderpriority")
        .orderBy(col("o_orderpriority"))
    },

    // aggregate/fold/combine: custom algebraic aggregation (sum of
    // squares accumulator) — partial-aggregated map-side by Catalyst.
    "q_aggregate" -> { (s, dir) =>
      tables(s, dir).events
        .groupBy(col("event_type"))
        // r2, not r6: a ~1e9 sum needs 15-16 significant digits at 6dp,
        // the edge of double precision — at millions of rows the two
        // engines' summation orders legitimately differ at 1e-6 and a
        // 6dp round flips (the sf1 gate caught exactly that)
        .agg(r2(sum(col("value") * col("value"))).as("sum_sq"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },

    // latest: max_by over event time.
    "q_latest" -> { (s, dir) =>
      tables(s, dir).events
        .groupBy(col("event_type"))
        .agg(r6(max_by(col("value"), col("ts"))).as("latest_value"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("latest_ts"))
        .orderBy(col("event_type"))
    },

    // top(n): TakeOrdered — per-partition heads merged, no global sort.
    "q_top" -> { (s, dir) =>
      tables(s, dir).orders
        .topBy(10, col("o_totalprice").desc, col("o_orderkey").asc)
        .select(col("o_orderkey"), r2(col("o_totalprice")).as("total"))
    },

    // dense 0..n-1 global index in doc_id order (scio/RDD
    // zipWithIndex parity): balanced bucketed prefix sums — never a
    // global sort or single-partition window.
    "q_zip_index" -> { (s, dir) =>
      graft.operators.GlobalOrder.zipWithGlobalIndex(
          tables(s, dir).documents.select(col("doc_id"), col("source")),
          "doc_id", "idx")
        .orderBy(col("doc_id"))
    },

    // union + distinct.
    "q_union" -> { (s, dir) =>
      val t = tables(s, dir)
      val a = t.orders.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
      val b = t.orders.filter(col("o_totalprice") > 300000.0).select(col("o_custkey").as("k"))
      a.union(b).distinct().agg(count(lit(1)).as("n"), min(col("k")).as("min_k"), max(col("k")).as("max_k"))
    },

    // intersection (set semantics).
    "q_intersection" -> { (s, dir) =>
      val t = tables(s, dir)
      val a = t.customer.select(col("c_custkey").as("k"))
      val b = t.orders.select(col("o_custkey").as("k"))
      a.intersect(b).agg(count(lit(1)).as("n"), min(col("k")).as("min_k"), max(col("k")).as("max_k"))
    },

    // subtract (except): customers who never ordered.
    "q_subtract" -> { (s, dir) =>
      val t = tables(s, dir)
      val a = t.customer.select(col("c_custkey").as("k"))
      val b = t.orders.select(col("o_custkey").as("k"))
      a.except(b).agg(count(lit(1)).as("n"),
        coalesce(min(col("k")), lit(-1L)).as("min_k"),
        coalesce(max(col("k")), lit(-1L)).as("max_k"))
    },

    // cross: cartesian of two small dims (broadcast NL join).
    "q_cross" -> { (s, dir) =>
      val t = tables(s, dir)
      val prio = t.orders.select(col("o_orderpriority")).distinct()
      t.region.crossJoin(broadcast(prio))
        .select(col("r_name"), col("o_orderpriority"))
        .orderBy(col("r_name"), col("o_orderpriority"))
    },

    // groupMapReduce: keyed map + algebraic reduce.
    "q_group_map_reduce" -> { (s, dir) =>
      tables(s, dir).lineitem
        .filter(col("l_suppkey") < 50)
        .groupBy(col("l_suppkey"))
        .agg(r2(sum(col("l_quantity"))).as("sum_qty"),
          r2(max(col("l_quantity"))).as("max_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_suppkey"))
    },

    // partition: one scan split into disjoint sides, summarized.
    "q_partition" -> { (s, dir) =>
      val (hi, lo) = tables(s, dir).lineitem.partitionBy2(col("l_quantity") >= 25.0)
      val a = hi.agg(lit("hi").as("side"), count(lit(1)).as("n"), r2(sum(col("l_quantity"))).as("qty"))
      val b = lo.agg(lit("lo").as("side"), count(lit(1)).as("n"), r2(sum(col("l_quantity"))).as("qty"))
      a.union(b).orderBy(col("side"))
    },

    // exact quantiles (scio quantilesApprox's oracle-checkable core;
    // approx variant in q_hll/q_approx pack).
    "q_quantiles" -> { (s, dir) =>
      tables(s, dir).lineitem
        .agg(percentile(col("l_quantity"), lit(0.25)).as("p_raw25"),
          percentile(col("l_quantity"), lit(0.5)).as("p_raw50"),
          percentile(col("l_quantity"), lit(0.75)).as("p_raw75"))
        .select(r6(col("p_raw25")).as("p25"), r6(col("p_raw50")).as("p50"), r6(col("p_raw75")).as("p75"))
    },

    // exact distinct count per group (countApproxDistinct's oracle).
    "q_exact_distinct" -> { (s, dir) =>
      tables(s, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"))
        .orderBy(col("l_returnflag"))
    },

    // deterministic systematic sample — reproducible across engines.
    "q_sample_hash" -> { (s, dir) =>
      tables(s, dir).orders
        .sampleSystematic("o_orderkey", 97)
        .select(col("o_orderkey"), col("o_custkey"), r2(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderkey"))
    },

    // HLL++ approximate distinct — rows-only gate (sketch internals
    // differ across engines); error bound asserted in ApproxSpec.
    "q_hll_distinct" -> { (s, dir) =>
      tables(s, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
        .orderBy(col("l_returnflag"))
    }
  )

  override val oracles: Map[String, String] = Map(
    "q_map" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) AS net_price
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_filter" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
        |FROM orders WHERE o_totalprice > 400000.0 AND o_orderstatus = 'F'
        |ORDER BY o_orderkey""".stripMargin,
    "q_flatmap" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token
        |  FROM documents WHERE doc_id < 10)
        |GROUP BY token ORDER BY token""".stripMargin,
    "q_collect" ->
      """SELECT event_id, value * 2.0 AS doubled
        |FROM events WHERE event_type = 'purchase' AND value > 90.0
        |ORDER BY event_id""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_distinct_by" ->
      """SELECT lang, source, min(doc_id) AS doc_id,
        |  arg_min(n_chars, doc_id) AS n_chars
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "q_count" ->
      """SELECT count(*) AS n FROM lineitem""",
    "q_global_agg" ->
      """SELECT count(*) AS n, round(sum(l_quantity), 2) AS sum_qty,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(min(l_extendedprice), 2) AS min_price,
        |  round(max(l_extendedprice), 2) AS max_price
        |FROM lineitem""".stripMargin,
    "q_count_by_value" ->
      """SELECT o_orderpriority, count(*) AS count FROM orders
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_aggregate" ->
      """SELECT event_type, round(sum(value * value), 2) AS sum_sq, count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_latest" ->
      """SELECT event_type, round(max_by(value, ts), 6) AS latest_value,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS latest_ts
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_top" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS total FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_zip_index" ->
      """SELECT doc_id, source,
        |  row_number() OVER (ORDER BY doc_id) - 1 AS idx
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_union" ->
      """SELECT count(*) AS n, min(k) AS min_k, max(k) AS max_k FROM (
        |  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |  UNION
        |  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000.0)""".stripMargin,
    "q_intersection" ->
      """SELECT count(*) AS n, min(k) AS min_k, max(k) AS max_k FROM (
        |  SELECT c_custkey AS k FROM customer
        |  INTERSECT
        |  SELECT o_custkey AS k FROM orders)""".stripMargin,
    "q_subtract" ->
      """SELECT count(*) AS n, coalesce(min(k), -1) AS min_k,
        |  coalesce(max(k), -1) AS max_k FROM (
        |  SELECT c_custkey AS k FROM customer
        |  EXCEPT
        |  SELECT o_custkey AS k FROM orders)""".stripMargin,
    "q_cross" ->
      """SELECT r_name, o_orderpriority
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders)
        |ORDER BY r_name, o_orderpriority""".stripMargin,
    "q_group_map_reduce" ->
      """SELECT l_suppkey, round(sum(l_quantity), 2) AS sum_qty,
        |  round(max(l_quantity), 2) AS max_qty, count(*) AS n
        |FROM lineitem WHERE l_suppkey < 50
        |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "q_partition" ->
      """SELECT 'hi' AS side, count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem WHERE l_quantity >= 25.0
        |UNION ALL
        |SELECT 'lo' AS side, count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem WHERE NOT (l_quantity >= 25.0)
        |ORDER BY side""".stripMargin,
    "q_quantiles" ->
      """SELECT round(quantile_cont(l_quantity, 0.25), 6) AS p25,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.75), 6) AS p75
        |FROM lineitem""".stripMargin,
    "q_exact_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_sample_hash" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
        |FROM orders WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey""".stripMargin
    // q_hll_distinct: intentionally no oracle (approximate sketch).
  )
}
