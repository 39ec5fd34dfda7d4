package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Portable._
import graft.sources.Tables

/** §2 D — the analytic SQL surface the reference pipeline assumes of both
  * source and target databases (reference: src/utils/query_optimizer
  * generates/analyzes exactly this kind of SQL; the CDC sink must keep it
  * answerable on PostgreSQL).
  *
  * All plans are declarative DataFrame code: Catalyst pushes filters into
  * the parquet scans, prunes columns, and (with AQE) picks
  * broadcast/sort-merge joins by size. Aggregates over doubles go through
  * [[graft.functions.Portable.dsum]] so results are reduction-order-proof.
  */
object AnalyticCore {
  /** DuckDB analog of [[graft.functions.Portable.dsum]] — see its doc. */
  private def s4(e: String) =
    s"CAST(SUM(CAST(FLOOR(($e)*10000 + 0.5) AS BIGINT)) AS DOUBLE)/10000.0"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    "q3_top_orders" -> { (s, d) =>
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d).filter(col("o_orderdate") < to_timestamp(lit("1998-03-15 00:00:00")))
      val l = Tables.lineitem(s, d).filter(col("l_shipdate") > to_timestamp(lit("1998-03-15 00:00:00")))
      // customer is the small side — let AQE broadcast it; lineitem⋈orders
      // shuffles on the orderkey both sides already need.
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(desc("revenue"), col("o_orderkey"))
        .limit(10)
    },

    "q5_local_supplier" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
                col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
      val l = Tables.lineitem(s, d)
      val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      // dims (region/nation/supplier/customer) are broadcast-size at any
      // SF relative to lineitem; the explicit broadcasts keep the big
      // fact tables from shuffling on dim keys.
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(c, col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    },

    "q7_volume_shipping" -> { (s, d) =>
      // TPC-H Q7 shape: bilateral shipping volume between two nations
      // by year. Dim joins broadcast; the fact table never shuffles
      // before the (nation, nation, year) aggregate.
      val n1 = Tables.nation(s, d).select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d).select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("sk"))
        .join(broadcast(n2), col("c_nationkey") === col("ck"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    "q10_returned_items" -> { (s, d) =>
      // TPC-H Q10 shape: top customers by revenue on returned items.
      Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(20)
    },

    "q15_top_supplier" -> { (s, d) =>
      // TPC-H Q15 shape: supplier(s) achieving the max quarterly revenue
      // — the correlated-max pattern as an aggregate crossJoin.
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
                col("l_shipdate") < to_timestamp(lit("1997-04-01 00:00:00")))
        .groupBy(col("l_suppkey"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total_revenue"))
      val top = rev.agg(max(col("total_revenue")).as("max_rev"))
      rev.crossJoin(broadcast(top))
        .filter(col("total_revenue") === col("max_rev"))
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    },

    "q_window_rank" -> { (s, d) =>
      val w = Window.partitionBy(col("c_nationkey")).orderBy(desc("c_acctbal"), col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
                row_number().over(w).as("rk"))
        .filter(col("rk") <= 3)
        .orderBy(col("c_nationkey"), col("rk"))
    },

    "q_rollup" -> { (s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
                coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
                col("sum_qty"), col("n"))
        .orderBy("rf", "ls")
    },

    "q_semi_anti" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val bigOrders = Tables.orders(s, d).filter(col("o_totalprice") > 300000.0)
      val withO = c.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .withColumn("tag", lit("with"))
      val withoutO = c.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .withColumn("tag", lit("without"))
      withO.unionByName(withoutO)
        .select("c_mktsegment", "tag", "n")
        .orderBy("c_mktsegment", "tag")
    },

    "q_distinct_topk" -> { (s, d) =>
      Tables.orders(s, d).select(col("o_custkey")).distinct()
        .orderBy(desc("o_custkey")).limit(100)
    },

    "q_events_tumbling" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("win_start"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("win_start", "event_type")
    },

    "q_events_sessionize" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"))
      Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("tus"))
        .withColumn("prev", lag(col("tus"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev").isNull || col("tus") - col("prev") > 1800000000L, 1L).otherwise(0L))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("new_sess")).as("n_sessions"))
        .orderBy("user_id")
    },

    "q_events_funnel" -> { (s, d) =>
      val e = Tables.events(s, d).select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"))
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("tus")).as("t_view"))
      val cAfterV = e.filter(col("event_type") === "click").as("e")
        .join(v.as("v"), col("e.user_id") === col("v.user_id"))
        .filter(col("e.tus") >= col("v.t_view"))
        .groupBy(col("e.user_id")).agg(min(col("e.tus")).as("t_click"))
      val pAfterC = e.filter(col("event_type") === "purchase").as("e")
        .join(cAfterV.as("c"), col("e.user_id") === col("c.user_id"))
        .filter(col("e.tus") >= col("c.t_click"))
        .groupBy(col("e.user_id")).agg(min(col("e.tus")).as("t_purchase"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(cAfterV.agg(count(lit(1)).as("n_view_click")))
        .crossJoin(pAfterC.agg(count(lit(1)).as("n_full_funnel")))
    }
  )

  def oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${s4("l_quantity")} AS sum_qty,
         |  ${s4("l_extendedprice")} AS sum_base_price,
         |  ${s4("l_extendedprice*(1-l_discount)")} AS sum_disc_price,
         |  ${s4("l_extendedprice*(1-l_discount)*(1+l_tax)")} AS sum_charge,
         |  ${s4("l_quantity")}/COUNT(*) AS avg_qty,
         |  ${s4("l_extendedprice")}/COUNT(*) AS avg_price,
         |  ${s4("l_discount")}/COUNT(*) AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_orders" ->
      s"""SELECT o_orderkey, ${s4("l_extendedprice*(1-l_discount)")} AS revenue,
         |  o_orderdate, o_orderpriority
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         |  AND l_orderkey = o_orderkey
         |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
         |GROUP BY o_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, o_orderkey
         |LIMIT 10""".stripMargin,

    "q5_local_supplier" ->
      s"""SELECT n_name, ${s4("l_extendedprice*(1-l_discount)")} AS revenue
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,

    "q7_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |  ${s4("l_extendedprice*(1-l_discount)")} AS revenue
         |FROM lineitem, orders, supplier, customer, nation n1, nation n2
         |WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
         |  AND o_custkey = c_custkey AND s_nationkey = n1.n_nationkey
         |  AND c_nationkey = n2.n_nationkey
         |  AND n1.n_name <> n2.n_name
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin,

    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, c_mktsegment,
         |  ${s4("l_extendedprice*(1-l_discount)")} AS revenue
         |FROM lineitem, orders, customer
         |WHERE l_returnflag = 'R' AND l_orderkey = o_orderkey
         |  AND o_custkey = c_custkey
         |GROUP BY c_custkey, c_name, c_mktsegment
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin,

    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, ${s4("l_extendedprice*(1-l_discount)")} AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,

    "q_window_rank" ->
      """SELECT c_custkey, c_nationkey, c_acctbal, rk FROM (
        |  SELECT c_custkey, c_nationkey, c_acctbal,
        |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |                       ORDER BY c_acctbal DESC, c_custkey) AS rk
        |  FROM customer) t
        |WHERE rk <= 3
        |ORDER BY c_nationkey, rk""".stripMargin,

    "q_rollup" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
         |  COALESCE(l_linestatus, 'ALL') AS ls,
         |  ${s4("l_quantity")} AS sum_qty, COUNT(*) AS n
         |FROM lineitem
         |GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY rf, ls""".stripMargin,

    "q_semi_anti" ->
      """SELECT c_mktsegment, 'with' AS tag, COUNT(*) AS n FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |GROUP BY c_mktsegment
        |UNION ALL
        |SELECT c_mktsegment, 'without' AS tag, COUNT(*) AS n FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment, tag""".stripMargin,

    "q_distinct_topk" ->
      "SELECT DISTINCT o_custkey FROM orders ORDER BY o_custkey DESC LIMIT 100",

    "q_events_tumbling" ->
      s"""SELECT date_trunc('hour', ts) AS win_start, event_type,
         |  COUNT(*) AS n, ${s4("value")} AS sum_value
         |FROM events
         |GROUP BY 1, 2
         |ORDER BY 1, 2""".stripMargin,

    "q_events_sessionize" ->
      """WITH m AS (
        |  SELECT user_id, epoch_us(ts) AS tus,
        |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN prev IS NULL OR tus - prev > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_events_funnel" ->
      """WITH v AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.t_view
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purchase
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.t_click
        |  GROUP BY e.user_id)
        |SELECT (SELECT COUNT(*) FROM v) AS n_view,
        |       (SELECT COUNT(*) FROM c) AS n_view_click,
        |       (SELECT COUNT(*) FROM p) AS n_full_funnel""".stripMargin
  )
}
