package graft.queries

import org.apache.spark.sql.functions._
import QueryDsl._

/** Headline analytic queries (TPC-H shapes) — the bench suite.
  *
  * These exercise the composition of graft operators the way scio
  * pipelines compose SCollection transforms
  * (reference: scio-examples/src/main/scala/com/spotify/scio/examples).
  * Plans are fully declarative: filters reach the parquet scan,
  * dimension joins broadcast, aggregates are partial (map-side).
  */
object AnalyticsQueries extends QueryPack {

  override val queries: Map[String, Q] = Map(
    // TPC-H Q1 shape: scan-heavy grouped aggregation with partial agg.
    "q1_pricing" -> { (s, dir) =>
      val t = tables(s, dir)
      t.lineitem
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          r2(sum(col("l_quantity"))).as("sum_qty"),
          // decimal sum, not round(sum(double)): at sf10 (60M rows,
          // sum ~2.8e11) the double sum's association error straddled
          // the 2dp rounding boundary — Spark said .99, DuckDB .00.
          // Each l_extendedprice is a 2dp money value, so the per-row
          // decimal cast is exact in both engines and decimal addition
          // is associative: the sum agrees bit-exactly at EVERY scale.
          // (sum_qty is safe as a double sum: integral values, exact
          // to 2^53.)
          sumMoney(dec(col("l_extendedprice"))).as("sum_base_price"),
          sumMoney(netDec(col("l_extendedprice"), col("l_discount"))).as("sum_disc_price"),
          sumMoney(netDec(col("l_extendedprice"), col("l_discount")) * (lit(1) + dec(col("l_tax")))).as("sum_charge"),
          r6(avg(col("l_quantity"))).as("avg_qty"),
          r6(avg(col("l_extendedprice"))).as("avg_price"),
          r6(avg(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // TPC-H Q3 shape: dim-filter → broadcast dim join → agg → top-n.
    "q3_shipping" -> { (s, dir) =>
      val t = tables(s, dir)
      val cust = t.customer.filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = t.orders.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = t.lineitem.filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sumMoney(netDec(col("l_extendedprice"), col("l_discount"))).as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },


    // TPC-H Q5 shape: 6-way join. Scale-first ordering: resolve
    // region→nation first (tiny), then semi-prune BOTH fact-side dims
    // (customer, supplier) to ASIA nations BEFORE the fact joins — 5×
    // less data enters the customer⋈orders⋈lineitem pipeline than
    // joining full dims and filtering at the end. Catalyst can't do
    // this reorder itself: the c_nationkey = s_nationkey equality only
    // links customer to the region filter through the supplier join.
    "q5_local_supplier" -> { (s, dir) =>
      val t = tables(s, dir)
      val asiaNations = t.nation
        .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cust = t.customer
        .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"))
      val supp = t.supplier
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val ord = t.orders
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      cust
        .join(ord, col("c_custkey") === col("o_custkey"))
        .join(t.lineitem.select(
            col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount")),
          col("o_orderkey") === col("l_orderkey"))
        .join(supp,
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(sumMoney(netDec(col("l_extendedprice"), col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // TPC-H Q7 shape: bidirectional nation-pair trade volume by ship
    // year. The nation filter lands on BOTH keyed dims before the fact
    // joins (the Q5 lesson, applied at authoring time); the OR-pair
    // condition evaluates on the joined row, not as a join explosion.
    "q7_nation_volume" -> { (s, dir) =>
      val t = tables(s, dir)
      val n1 = "NATION_1"
      val n2 = "NATION_2"
      val nat = t.nation.filter(col("n_name").isin(n1, n2))
        .select(col("n_nationkey"), col("n_name"))
      val supp = t.supplier.join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = t.customer.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      t.lineitem
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"), year(col("l_shipdate")).as("l_year"))
        .join(t.orders.select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === n1 && col("cust_nation") === n2) ||
          (col("supp_nation") === n2 && col("cust_nation") === n1))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(sumMoney(netDec(col("l_extendedprice"), col("l_discount"))).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },

    // TPC-H Q8 shape: a supplier nation's market share inside a
    // customer region for one part type, by order year — conditional
    // aggregation over a 7-table join, every dim broadcast.
    "q8_market_share" -> { (s, dir) =>
      val t = tables(s, dir)
      val asiaNations = t.nation
        .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val cust = t.customer.join(broadcast(asiaNations),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val prt = t.part.filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
      val supp = t.supplier
        .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val vol = netDec(col("l_extendedprice"), col("l_discount"))
      t.lineitem
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(broadcast(prt), col("l_partkey") === col("p_partkey"))
        .join(t.orders
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
            .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("o_year"))
        .agg(r6(sum(when(col("supp_nation") === "NATION_3", vol).otherwise(lit(0))) /
          sum(vol)).cast("double").as("mkt_share"))
        .orderBy(col("o_year"))
    },

    // TPC-H Q9 shape: per-nation profit by year for parts matching a
    // LIKE pattern (no partsupp table in this corpus, so profit is
    // net revenue). The part filter broadcasts; nation resolves
    // through the supplier.
    "q9_product_profit" -> { (s, dir) =>
      val t = tables(s, dir)
      val prt = t.part.filter(col("p_name").like("%red%")).select(col("p_partkey"))
      val supp = t.supplier
        .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      t.lineitem
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(broadcast(prt), col("l_partkey") === col("p_partkey"))
        .join(t.orders.select(col("o_orderkey"), year(col("o_orderdate")).as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("n_name"), col("o_year"))
        .agg(sumMoney(netDec(col("l_extendedprice"), col("l_discount"))).as("profit"))
        .orderBy(col("n_name"), col("o_year"))
    },

    // TPC-H Q4 shape: priority census of orders with at least one
    // late-shipping lineitem — an INEQUALITY left-semi join (the
    // EXISTS); the fact side never multiplies.
    "q4_order_priority" -> { (s, dir) =>
      val t = tables(s, dir)
      val ord = t.orders
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      val li = t.lineitem.select(col("l_orderkey"), col("l_shipdate"))
      ord.join(li,
          ord("o_orderkey") === li("l_orderkey") &&
            li("l_shipdate") > ord("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },

    // TPC-H Q18 shape: large-volume orders — group-filter (HAVING) on
    // the fact, then join order/customer context, top-n. The HAVING
    // aggregation partial-aggregates; only qualifying keys join.
    "q18_large_orders" -> { (s, dir) =>
      val t = tables(s, dir)
      val big = t.lineitem
        .groupBy(col("l_orderkey"))
        .agg(r2(sum(col("l_quantity"))).as("sum_qty"))
        .filter(col("sum_qty") > 250)
      t.orders
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t.customer.select(col("c_custkey"), col("c_name"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          r2(col("o_totalprice")).as("totalprice"), col("sum_qty"))
        .orderBy(col("totalprice").desc, col("o_orderkey"))
        .limit(10)
    },

    // TPC-H Q6 shape: pure scan-filter-aggregate forecast — every
    // predicate pushes to the parquet scan, one partial-agg row out.
    "q6_forecast" -> { (s, dir) =>
      tables(s, dir).lineitem
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
        .agg(sumMoney(dec(col("l_extendedprice")) * dec(col("l_discount"))).as("revenue"))
    },

    // TPC-H Q10 shape: top customers by returned-item revenue — fact
    // filter, two joins (customer context broadcast), agg, top-n.
    "q10_returned" -> { (s, dir) =>
      val t = tables(s, dir)
      val ord = t.orders
        .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val cust = t.customer
        .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      t.lineitem.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sumMoney(netDec(col("l_extendedprice"), col("l_discount"))).as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          r2(col("c_acctbal")).as("acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // TPC-H Q14 shape: promo revenue share — broadcast part join,
    // conditional aggregation ratio, one row.
    "q14_promo" -> { (s, dir) =>
      val t = tables(s, dir)
      val net = netDec(col("l_extendedprice"), col("l_discount"))
      t.lineitem
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
        .join(broadcast(t.part.select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(r6(sum(when(col("p_type") === "PROMO", net).otherwise(lit(0)))
            .cast("double") * 100.0 / sum(net).cast("double"))
          .as("promo_share"))
    },

    // TPC-H Q19 shape: disjunctive multi-attribute predicate (OR of
    // brand/size/quantity bands) evaluated on the joined row — the
    // classic pushdown-hostile filter kept tight against one join.
    "q19_discounted" -> { (s, dir) =>
      val t = tables(s, dir)
      t.lineitem
        .select(col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
        .join(broadcast(t.part.select(col("p_partkey"), col("p_brand"), col("p_size"))),
          col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
            col("l_quantity").between(1, 15)) ||
          (col("p_brand") === "Brand#7" && col("p_size").between(1, 20) &&
            col("l_quantity").between(10, 25)) ||
          (col("p_brand") === "Brand#13" && col("p_size").between(1, 30) &&
            col("l_quantity").between(20, 35)))
        .agg(sumMoney(netDec(col("l_extendedprice"), col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
    },

    // TPC-H Q20 shape: suppliers with excess promo supply — nested
    // qualification (HAVING over the fact) feeding a left-semi join,
    // nation context broadcast.
    "q20_excess_supply" -> { (s, dir) =>
      val t = tables(s, dir)
      val bigSupp = t.lineitem
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(t.part.filter(col("p_type") === "PROMO").select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"))
        .agg(r2(sum(col("l_quantity"))).as("tot_qty"))
        .filter(col("tot_qty") > 400)
      t.supplier
        .join(bigSupp, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_name"), col("n_name"))
        .orderBy(col("s_name"))
    },

    // TPC-H Q13 shape: customer order-count distribution — left outer
    // join (customers with no orders count at 0), two-level agg.
    "q13_order_dist" -> { (s, dir) =>
      val t = tables(s, dir)
      t.customer.select(col("c_custkey"))
        .join(t.orders.select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_custkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // TPC-H Q15 shape: the top-revenue supplier(s) — an aggregated
    // "view" joined against its own maximum (ties kept, per the spec).
    "q15_top_supplier" -> { (s, dir) =>
      val t = tables(s, dir)
      val revenue = t.lineitem
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sumMoney(netDec(col("l_extendedprice"), col("l_discount"))).as("total_rev"))
      val maxRev = broadcast(revenue.agg(max(col("total_rev")).as("__mx")))
      t.supplier
        .join(revenue, col("s_suppkey") === col("l_suppkey"))
        .crossJoin(maxRev)
        .filter(col("total_rev") === col("__mx"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev"))
        .orderBy(col("s_suppkey"))
    },

    // TPC-H Q17 shape: small-quantity-order revenue — per-part avg
    // quantity (the correlated subquery) joined back against the same
    // fact rows; the brand filter broadcasts into both sides.
    "q17_small_qty" -> { (s, dir) =>
      val t = tables(s, dir)
      val brandParts = t.part.filter(col("p_brand") === "Brand#13")
        .select(col("p_partkey"))
      val li = t.lineitem
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
      val avgQty = li.groupBy(col("l_partkey").as("__pk"))
        .agg((avg(col("l_quantity")) * 0.5).as("__half_avg"))
      li.join(avgQty, col("l_partkey") === col("__pk"))
        .filter(col("l_quantity") < col("__half_avg"))
        .agg(r2(sum(dec(col("l_extendedprice"))).cast("double") / 7.0).as("avg_yearly"),
          count(lit(1)).as("n_small"))
    },

    // TPC-H Q22 shape: per-nation count/balance of rich-but-inactive
    // customers — scalar aggregate threshold + ANTI join against
    // orders (the NOT EXISTS), customer side broadcast-filtered.
    // market-basket association rules over order baskets: part-class
    // pairs with support/confidence/lift, in-task pair generation.
    "q_basket_rules" -> { (s, dir) =>
      val rows = tables(s, dir).lineitem
        .select(col("l_orderkey").as("basket"), (col("l_partkey") % 100).as("item"))
      graft.operators.Baskets.associationRules(rows, "basket", "item",
          minSupport = 20L)
        .select(col("item_a"), col("item_b"), col("support"),
          r6(col("conf_a_b")).as("conf_a_b"), r6(col("conf_b_a")).as("conf_b_a"),
          r6(col("lift")).as("lift"))
        .orderBy(col("item_a"), col("item_b"))
    },

    // RFM customer segmentation: per-customer recency/frequency/
    // monetary quintile scores against EXACT percentile boundaries
    // computed once and broadcast — never a global ntile window (the
    // single-partition trap); strict > comparisons keep boundary ties
    // deterministic in both engines.
    "q_rfm" -> { (s, dir) =>
      val base = tables(s, dir).orders.groupBy(col("o_custkey"))
        .agg(datediff(lit("1998-12-31").cast("date"), max(col("o_orderdate")))
            .cast("long").as("recency_days"),
          count(lit(1)).as("frequency"),
          sumMoney(dec(col("o_totalprice"))).as("monetary"))
      val qs = Seq(0.2, 0.4, 0.6, 0.8)
      val bounds =
        qs.zipWithIndex.map { case (q, i) =>
          percentile(col("recency_days"), lit(q)).as(s"rb$i") } ++
        qs.zipWithIndex.map { case (q, i) =>
          percentile(col("frequency"), lit(q)).as(s"fb$i") } ++
        qs.zipWithIndex.map { case (q, i) =>
          percentile(col("monetary"), lit(q)).as(s"mb$i") }
      val bAgg = base.agg(bounds.head, bounds.tail: _*)
      def above(v: org.apache.spark.sql.Column, pre: String) =
        (0 until 4).map(i => when(v > col(s"$pre$i"), 1).otherwise(0)).reduce(_ + _)
      base.crossJoin(broadcast(bAgg))
        .select(col("o_custkey"), col("recency_days"), col("frequency"), col("monetary"),
          (lit(5) - above(col("recency_days"), "rb")).as("r_score"),
          (lit(1) + above(col("frequency"), "fb")).as("f_score"),
          (lit(1) + above(col("monetary"), "mb")).as("m_score"))
        .orderBy(col("o_custkey"))
    },

    "q22_sales_opportunity" -> { (s, dir) =>
      val t = tables(s, dir)
      val avgBal = t.customer.filter(col("c_acctbal") > 0)
        .agg(avg(col("c_acctbal")).as("__avg"))
      val rich = t.customer
        .join(broadcast(avgBal))
        .filter(col("c_acctbal") > col("__avg"))
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      rich.join(t.orders.select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"), sumMoney(dec(col("c_acctbal"))).as("totacctbal"))
        .orderBy(col("c_nationkey"))
    }
  )

  override val oracles: Map[String, String] = Map(
    "q_basket_rules" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey % 100 AS i FROM lineitem),
        |n AS (SELECT count(DISTINCT b) AS nb FROM items),
        |ic AS (SELECT i, count(*) AS ci FROM items GROUP BY 1),
        |pairs AS (
        |  SELECT x.i AS item_a, y.i AS item_b, count(*) AS support
        |  FROM items x JOIN items y ON x.b = y.b AND x.i < y.i
        |  GROUP BY 1, 2 HAVING count(*) >= 20)
        |SELECT p.item_a, p.item_b, p.support,
        |  round(CAST(p.support AS DOUBLE) / ca.ci, 6) AS conf_a_b,
        |  round(CAST(p.support AS DOUBLE) / cb.ci, 6) AS conf_b_a,
        |  round(CAST(p.support AS DOUBLE) * nb /
        |    (CAST(ca.ci AS DOUBLE) * CAST(cb.ci AS DOUBLE)), 6) AS lift
        |FROM pairs p
        |JOIN ic ca ON p.item_a = ca.i
        |JOIN ic cb ON p.item_b = cb.i
        |CROSS JOIN n
        |ORDER BY item_a, item_b""".stripMargin,
    "q_rfm" ->
      """WITH base AS (
        |  SELECT o_custkey,
        |    CAST(datediff('day', max(o_orderdate), DATE '1998-12-31') AS BIGINT)
        |      AS recency_days,
        |    count(*) AS frequency,
        |    CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS monetary
        |  FROM orders GROUP BY 1),
        |b AS (
        |  SELECT
        |    quantile_cont(recency_days, 0.2) AS rb0, quantile_cont(recency_days, 0.4) AS rb1,
        |    quantile_cont(recency_days, 0.6) AS rb2, quantile_cont(recency_days, 0.8) AS rb3,
        |    quantile_cont(frequency, 0.2) AS fb0, quantile_cont(frequency, 0.4) AS fb1,
        |    quantile_cont(frequency, 0.6) AS fb2, quantile_cont(frequency, 0.8) AS fb3,
        |    quantile_cont(monetary, 0.2) AS mb0, quantile_cont(monetary, 0.4) AS mb1,
        |    quantile_cont(monetary, 0.6) AS mb2, quantile_cont(monetary, 0.8) AS mb3
        |  FROM base)
        |SELECT o_custkey, recency_days, frequency, monetary,
        |  5 - ((recency_days > rb0)::INT + (recency_days > rb1)::INT
        |     + (recency_days > rb2)::INT + (recency_days > rb3)::INT) AS r_score,
        |  1 + ((frequency > fb0)::INT + (frequency > fb1)::INT
        |     + (frequency > fb2)::INT + (frequency > fb3)::INT) AS f_score,
        |  1 + ((monetary > mb0)::INT + (monetary > mb1)::INT
        |     + (monetary > mb2)::INT + (monetary > mb3)::INT) AS m_score
        |FROM base CROSS JOIN b ORDER BY o_custkey""".stripMargin,
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))), 2) AS DOUBLE) AS sum_charge,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_extendedprice), 6) AS avg_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping" ->
      """SELECT l_orderkey,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  o_orderpriority
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1997-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,
    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(round(sum(CASE WHEN n2.n_name = 'NATION_3'
        |    THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
        |    ELSE 0 END)
        |   / sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 6) AS DOUBLE) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING round(sum(l_quantity), 2) > 250)
        |SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  round(o_totalprice, 2) AS totalprice, sum_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q13_order_dist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_custkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |    CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_rev
        |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q17_small_qty" ->
      """WITH li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#13'),
        |a AS (SELECT l_partkey AS pk, avg(l_quantity) * 0.5 AS half_avg
        |      FROM li GROUP BY 1)
        |SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0, 2)
        |    AS avg_yearly,
        |  count(*) AS n_small
        |FROM li JOIN a ON l_partkey = a.pk
        |WHERE l_quantity < a.half_avg""".stripMargin,
    "q6_forecast" ->
      """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q10_returned" ->
      """SELECT c_custkey, c_name,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue,
        |  round(c_acctbal, 2) AS acctbal, n_name
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "q14_promo" ->
      """SELECT round(CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
        |    ELSE 0 END) AS DOUBLE) * 100.0
        |  / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE), 6) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin,
    "q19_discounted" ->
      """SELECT
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15)
        |   OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 25)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 35)""".stripMargin,
    "q20_excess_supply" ->
      """WITH big AS (
        |  SELECT l_suppkey, round(sum(l_quantity), 2) AS tot_qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_type = 'PROMO'
        |    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1 HAVING round(sum(l_quantity), 2) > 400)
        |SELECT s_name, n_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (SELECT l_suppkey FROM big)
        |ORDER BY s_name""".stripMargin,
    "q22_sales_opportunity" ->
      """SELECT c_nationkey, count(*) AS numcust,
        |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
