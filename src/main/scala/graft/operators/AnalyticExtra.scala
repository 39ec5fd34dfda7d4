package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Portable._
import graft.sources.Tables

/** §2 D (continued) — the rest of the distinctive TPC-H query shapes,
  * adapted to the driver lake's columns (no partsupp / shipmode /
  * commitdate — see TESTDATA.md). These widen the analytic surface the
  * reference pipeline must keep answerable on the target database
  * (reference: src/utils/query_optimizer/analyzer.py reasons over
  * exactly these plan shapes: pure scan-aggregates, EXISTS/NOT-EXISTS,
  * disjunctive pushdown, HAVING-IN, correlated scalar subqueries).
  *
  * Scale notes are per-query; the common rules: filters sit on the scan
  * (pushed to parquet), dims are `broadcast()`, the lineitem fact never
  * shuffles except on a key the aggregate itself needs, and every double
  * reduction goes through [[graft.functions.Portable.dsum]].
  */
object AnalyticExtra {
  private def s4(e: String) =
    s"CAST(SUM(CAST(FLOOR(($e)*10000 + 0.5) AS BIGINT)) AS DOUBLE)/10000.0"

  /** Portable 6-decimal rounding — single IEEE ops both engines. */
  private def r6(c: org.apache.spark.sql.Column) =
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q6: the purest scan-aggregate — no join, no group. At 100 TB
    // this is the query that proves pushdown: all three predicates reach
    // the parquet scan (PushedFilters), only 4 columns are read, and the
    // single-row aggregate is a partial-combine then a 1-row exchange.
    "q6_revenue_delta" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
                col("l_shipdate") <  to_timestamp(lit("1997-01-01 00:00:00")) &&
                col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24.0)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))
    },

    // TPC-H Q4 shape: EXISTS decorrelated to a left-semi join. The
    // returnflag filter is applied to lineitem BEFORE the semi join so
    // the probe side shrinks at the scan, and the semi join carries only
    // l_orderkey — 8 bytes/row of shuffle at any scale.
    "q4_order_priority" -> { (s, d) =>
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
                col("o_orderdate") <  to_timestamp(lit("1997-04-01 00:00:00")))
      val returned = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R").select(col("l_orderkey"))
      o.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // TPC-H Q12 shape (linestatus standing in for shipmode): one
    // fact-fact join on the orderkey both sides already need, then
    // conditional aggregation — the high/low split is a projection, not
    // two passes.
    "q12_priority_split" -> { (s, d) =>
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
                col("l_shipdate") <  to_timestamp(lit("1998-01-01 00:00:00")))
        .select(col("l_orderkey"), col("l_linestatus"))
      l.join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
             col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("low_line_count"))
        .orderBy("l_linestatus")
    },

    // TPC-H Q14: promo revenue share over one month. part is a dim →
    // broadcast; the ratio of two fixed-point dsums is one IEEE divide of
    // doubles that are bit-identical in both engines, then r6-rounded.
    "q14_promo_effect" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-09-01 00:00:00")) &&
                col("l_shipdate") <  to_timestamp(lit("1997-10-01 00:00:00")))
        .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_type"))),
              col("l_partkey") === col("p_partkey"))
        .agg(
          dsum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1.0) - col("l_discount"))).otherwise(lit(0.0)))
            .as("promo_revenue"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("total_revenue"))
        .withColumn("promo_pct",
          r6(lit(100.0) * col("promo_revenue") / col("total_revenue")))
    },

    // TPC-H Q18 shape: HAVING-IN large orders. The heavy groupBy runs on
    // lineitem's natural key (one shuffle the aggregate needs anyway);
    // the >300 filter cuts it to a sliver before any join; customer is
    // broadcast against the surviving rows.
    "q18_large_orders" -> { (s, d) =>
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 300.0)
      big.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d).select(col("c_custkey"), col("c_name"))),
              col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
                col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(20)
    },

    // TPC-H Q19 shape: disjunctive brand/size/quantity predicates. The
    // three OR arms share the join key, so this stays ONE broadcast join
    // with a residual disjunction — not a union of three joins; the
    // l_quantity bounds (1..30 overall) still push to the scan.
    "q19_disjunctive" -> { (s, d) =>
      val p = broadcast(Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"), col("p_size")))
      Tables.lineitem(s, d)
        .filter(col("l_quantity") >= 1.0 && col("l_quantity") <= 30.0)
        .join(p, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#11" && col("p_size").between(1, 5) &&
             col("l_quantity").between(1.0, 11.0)) ||
          (col("p_brand") === "Brand#22" && col("p_size").between(1, 10) &&
             col("l_quantity").between(10.0, 20.0)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
             col("l_quantity").between(20.0, 30.0)))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    },

    // TPC-H Q8 shape: market share of one supplier-nation by order year,
    // restricted to AMERICA-region customers and ECONOMY parts. Every
    // non-lineitem input is broadcast; the share is a conditional/total
    // dsum ratio per year.
    "q8_market_share" -> { (s, d) =>
      val amerCust = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "AMERICA")),
              col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      val suppNation = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d).select(col("n_nationkey").as("snk"),
                                                   col("n_name").as("supp_nation"))),
              col("s_nationkey") === col("snk"))
        .select(col("s_suppkey"), col("supp_nation"))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(col("p_type") === "ECONOMY")
                          .select(col("p_partkey"))),
              col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
                                         col("o_orderdate")),
              col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(amerCust), col("o_custkey") === col("c_custkey"), "left_semi")
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          dsum(when(col("supp_nation") === "NATION_7",
            col("l_extendedprice") * (lit(1.0) - col("l_discount"))).otherwise(lit(0.0)))
            .as("nation_volume"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("total_volume"))
        .withColumn("mkt_share", r6(col("nation_volume") / col("total_volume")))
        .orderBy("o_year")
    },

    // TPC-H Q21 shape: the double-correlated EXISTS / NOT EXISTS —
    // suppliers who were the ONLY returning supplier on a finished
    // multi-supplier order. Both subqueries decorrelate to one semi and
    // one anti join keyed on l_orderkey with a suppkey<>suppkey residual;
    // the shuffled payload is (orderkey, suppkey) pairs only.
    "q21_waiting_supplier" -> { (s, d) =>
      val l1 = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_suppkey")).as("l1")
      val lAll = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("k2"), col("l_suppkey").as("sk2"))
      val lRet = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("k3"), col("l_suppkey").as("sk3"))
      val fOrders = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"))
      l1.join(fOrders, col("l1.l_orderkey") === col("o_orderkey"), "left_semi")
        .join(lAll, col("l1.l_orderkey") === col("k2") &&
                    col("l1.l_suppkey") =!= col("sk2"), "left_semi")
        .join(lRet, col("l1.l_orderkey") === col("k3") &&
                    col("l1.l_suppkey") =!= col("sk3"), "left_anti")
        .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))),
              col("l1.l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), col("s_name"))
        .limit(10)
    },

    // TPC-H Q22 shape: above-average customers idle since 1999 ("have
    // not placed orders for N years"). The scalar average is a 1-row
    // broadcast (no per-row subquery); orders participates only through
    // an anti join whose date filter is pushed to its scan and whose
    // shuffle carries o_custkey alone.
    "q22_idle_customers" -> { (s, d) =>
      val thr = Tables.customer(s, d).filter(col("c_acctbal") > 0.0)
        .agg(davg(col("c_acctbal")).as("thr"))
      val recent = Tables.orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit("1999-01-01 00:00:00")))
        .select(col("o_custkey"))
      Tables.customer(s, d)
        .crossJoin(broadcast(thr))
        .filter(col("c_acctbal") > col("thr"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("c_mktsegment")
    },

    // TPC-H Q2 shape: min-cost supplier per part (the correlated scalar
    // MIN). No partsupp table in the lake, so the part-supplier price
    // relation is derived from lineitem: unit_cost(part, supp) =
    // min(l_extendedprice / l_quantity). Suppliers/nations/parts are all
    // broadcast; the only big shuffles are the (part, supp) groupBy and
    // the per-part window min — both keyed on p_partkey.
    "q2_min_cost_supp" -> { (s, d) =>
      val eur = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
              col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
      val parts = Tables.part(s, d)
        .filter(col("p_size") === 15 && col("p_type") === "STANDARD")
        .select(col("p_partkey"), col("p_name"))
      val costs = Tables.lineitem(s, d)
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(eur), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
                 col("s_acctbal"), col("n_name"))
        .agg(r6(min(col("l_extendedprice") / col("l_quantity"))).as("unit_cost"))
      val w = Window.partitionBy(col("p_partkey"))
      costs.withColumn("min_cost", min(col("unit_cost")).over(w))
        .filter(col("unit_cost") === col("min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
                col("p_name"), col("unit_cost"))
        .orderBy(desc("s_acctbal"), col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    },

    // TPC-H Q9 shape: product-line profit by supplier nation and order
    // year. p_retailprice stands in for ps_supplycost (no partsupp):
    // profit = revenue - 0.1 * retailprice * qty. part and
    // supplier⋈nation are broadcast; orders joins on the key lineitem
    // already carries; one groupBy shuffle on the tiny (nation, year) key.
    "q9_product_profit" -> { (s, d) =>
      val p = broadcast(Tables.part(s, d).filter(col("p_name").like("%widget%"))
        .select(col("p_partkey"), col("p_retailprice")))
      val sn = broadcast(Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name")))
      Tables.lineitem(s, d)
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
              col("l_orderkey") === col("o_orderkey"))
        .join(sn, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("n_name").as("nation"),
                 year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
                  col("p_retailprice") * col("l_quantity") * lit(0.1)).as("sum_profit"))
        .orderBy(col("nation"), desc("o_year"))
    },

    // TPC-H Q11 shape: important stock — parts whose value through
    // NATION_3 suppliers exceeds a fixed fraction of the total (the
    // scalar-subquery HAVING). The threshold is a 1-row broadcast; the
    // value table is computed once per leg exactly like the reference's
    // scalar subquery re-scan, and both legs push the supplier semi-join
    // into the scan side.
    "q11_important_stock" -> { (s, d) =>
      val n3sup = broadcast(Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_3")),
              col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey")))
      // localCheckpoint: both the threshold leg and the filter leg read
      // this per-partkey rollup, so lineitem is scanned ONCE, not once
      // per leg; blocks auto-release when the plan is dereferenced
      val vals = Tables.lineitem(s, d)
        .join(n3sup, col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy(col("l_partkey"))
        .agg(dsum(col("l_extendedprice")).as("value"))
        .localCheckpoint()
      val tot = vals.agg(dsum(col("value")).as("tot"))
      vals.crossJoin(broadcast(tot))
        .filter(col("value") > col("tot") * lit(0.001))
        .select(col("l_partkey"), col("value"))
        .orderBy(desc("value"), col("l_partkey"))
    },

    // TPC-H Q13 shape: customer order-count distribution. LEFT OUTER join
    // so zero-order customers survive into the c_count=0 bucket; the
    // priority exclusion stands in for the o_comment NOT LIKE filter.
    // Two shuffles, each on the key its aggregate needs (custkey, then
    // the tiny c_count domain).
    "q13_order_distribution" -> { (s, d) =>
      val o = Tables.orders(s, d).filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"))
      Tables.customer(s, d).select(col("c_custkey"))
        .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    },

    // TPC-H Q16 shape: supplier count per (brand, type, size) with a
    // NOT-IN supplier exclusion. The partsupp relation is reconstructed
    // as DISTINCT (l_partkey, l_suppkey) — one shuffle; the excluded
    // suppliers and the filtered part dim are broadcast; countDistinct
    // re-uses the same partkey-clustered layout.
    "q16_supplier_cnt" -> { (s, d) =>
      val excl = broadcast(Tables.supplier(s, d)
        .filter(col("s_name").like("%7")).select(col("s_suppkey")))
      val ps = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .join(excl, col("l_suppkey") === col("s_suppkey"), "left_anti")
      ps.join(broadcast(Tables.part(s, d)
            .filter(col("p_brand") =!= "Brand#9" && !col("p_type").like("MEDIUM%") &&
                    col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
            .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"), col("p_size"))
    },

    // TPC-H Q17 shape: revenue lost to small-quantity orders — the
    // correlated per-part AVG. The per-part average is an aggregate over
    // the SAME broadcast-filtered lineitem slice, joined back broadcast
    // (the filtered part list is tiny); threshold 0.5·avg keeps the
    // selection non-degenerate on the uniform quantity fixture.
    "q17_small_qty_revenue" -> { (s, d) =>
      val p = broadcast(Tables.part(s, d)
        .filter(col("p_brand") === "Brand#3" && col("p_type") === "SMALL")
        .select(col("p_partkey")))
      // localCheckpoint: the avg leg and the final filter both read the
      // same filtered slice — one lineitem scan, blocks auto-released
      val li = Tables.lineitem(s, d)
        .join(p, col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        .localCheckpoint()
      val stats = li.groupBy(col("l_partkey").as("pk"))
        .agg(davg(col("l_quantity")).as("avg_qty"))
      li.join(broadcast(stats), col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < col("avg_qty") * lit(0.5))
        .agg(r6(dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
    },

    // TPC-H Q20 shape: suppliers who shipped an above-average volume of
    // 'small%' parts in 1997 (availqty > ½·shipped becomes shipped >
    // avg-shipped — same nested-aggregate-feeding-a-semi-join plan). The
    // threshold is a 1-row broadcast; the supplier dim side is broadcast;
    // lineitem shuffles once on l_suppkey.
    "q20_ship_heavy_suppliers" -> { (s, d) =>
      val p = broadcast(Tables.part(s, d).filter(col("p_name").like("small%"))
        .select(col("p_partkey")))
      // localCheckpoint: the threshold leg and the heavy filter share
      // this per-suppkey rollup — one lineitem scan, blocks auto-released
      val shipped = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
                col("l_shipdate") <  to_timestamp(lit("1998-01-01 00:00:00")))
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"))
        .agg(dsum(col("l_quantity")).as("qty"))
        .localCheckpoint()
      val thr = shipped.agg(davg(col("qty")).as("thr"))
      val heavy = shipped.crossJoin(broadcast(thr)).filter(col("qty") > col("thr"))
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))),
              col("s_nationkey") === col("n_nationkey"))
        .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
        .orderBy(col("s_name"))
    }
  )

  def oracles: Map[String, String] = Map(
    "q6_revenue_delta" ->
      s"""SELECT ${s4("l_extendedprice*l_discount")} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q12_priority_split" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,

    "q14_promo_effect" ->
      s"""SELECT promo_revenue, total_revenue,
         |  FLOOR(100.0*promo_revenue/total_revenue * 1e6 + 0.5)/1e6 AS promo_pct
         |FROM (
         |  SELECT
         |    ${s4("CASE WHEN p_type = 'PROMO' THEN l_extendedprice*(1-l_discount) ELSE 0 END")} AS promo_revenue,
         |    ${s4("l_extendedprice*(1-l_discount)")} AS total_revenue
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
         |    AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00') t""".stripMargin,

    "q18_large_orders" ->
      s"""WITH big AS (
         |  SELECT l_orderkey, ${s4("l_quantity")} AS sum_qty
         |  FROM lineitem GROUP BY l_orderkey)
         |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
         |FROM big
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE sum_qty > 300
         |ORDER BY o_totalprice DESC, o_orderkey
         |LIMIT 20""".stripMargin,

    "q19_disjunctive" ->
      s"""SELECT ${s4("l_extendedprice*(1-l_discount)")} AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5
         |        AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 10
         |        AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
         |        AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q8_market_share" ->
      s"""SELECT o_year, nation_volume, total_volume,
         |  FLOOR(nation_volume/total_volume * 1e6 + 0.5)/1e6 AS mkt_share
         |FROM (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |    ${s4("CASE WHEN n2.n_name = 'NATION_7' THEN l_extendedprice*(1-l_discount) ELSE 0 END")} AS nation_volume,
         |    ${s4("l_extendedprice*(1-l_discount)")} AS total_volume
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |  WHERE EXISTS (
         |    SELECT 1 FROM customer
         |    JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |    JOIN region ON n1.n_regionkey = r_regionkey
         |    WHERE c_custkey = o_custkey AND r_name = 'AMERICA')
         |  GROUP BY 1) t
         |ORDER BY o_year""".stripMargin,

    "q21_waiting_supplier" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM lineitem l1
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM orders
        |              WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F')
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 10""".stripMargin,

    "q22_idle_customers" ->
      s"""WITH thr AS (
         |  SELECT ${s4("c_acctbal")}/COUNT(*) AS thr
         |  FROM customer WHERE c_acctbal > 0)
         |SELECT c_mktsegment, COUNT(*) AS numcust, ${s4("c_acctbal")} AS totacctbal
         |FROM customer, thr
         |WHERE c_acctbal > thr.thr
         |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
         |                  AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment""".stripMargin,

    "q2_min_cost_supp" ->
      """WITH costs AS (
        |  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
        |    FLOOR(MIN(l_extendedprice/l_quantity) * 1e6 + 0.5)/1e6 AS unit_cost
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_size = 15 AND p_type = 'STANDARD'
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |  GROUP BY 1, 2, 3, 4, 5, 6),
        |m AS (
        |  SELECT *, MIN(unit_cost) OVER (PARTITION BY p_partkey) AS min_cost
        |  FROM costs)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
        |FROM m WHERE unit_cost = min_cost
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "q9_product_profit" ->
      s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  ${s4("l_extendedprice*(1-l_discount) - p_retailprice*l_quantity*0.1")} AS sum_profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |GROUP BY 1, 2
         |ORDER BY nation, o_year DESC""".stripMargin,

    "q11_important_stock" ->
      s"""WITH vals AS (
         |  SELECT l_partkey, ${s4("l_extendedprice")} AS value
         |  FROM lineitem
         |  WHERE EXISTS (
         |    SELECT 1 FROM supplier
         |    JOIN nation ON s_nationkey = n_nationkey
         |    WHERE s_suppkey = l_suppkey AND n_name = 'NATION_3')
         |  GROUP BY l_partkey)
         |SELECT l_partkey, value FROM vals
         |WHERE value > (SELECT ${s4("value")} * 0.001 FROM vals)
         |ORDER BY value DESC, l_partkey""".stripMargin,

    "q13_order_distribution" ->
      """WITH per_cust AS (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT c_count, COUNT(*) AS custdist
        |FROM per_cust
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q16_supplier_cnt" ->
      """WITH ps AS (
        |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM ps
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#9' AND p_type NOT LIKE 'MEDIUM%'
        |  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q17_small_qty_revenue" ->
      s"""WITH li AS (
         |  SELECT l_partkey, l_quantity, l_extendedprice
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey
         |    AND p_brand = 'Brand#3' AND p_type = 'SMALL'),
         |stats AS (
         |  SELECT l_partkey AS pk, ${s4("l_quantity")}/COUNT(*) AS avg_qty
         |  FROM li GROUP BY l_partkey)
         |SELECT FLOOR(${s4("l_extendedprice")}/7.0 * 1e6 + 0.5)/1e6 AS avg_yearly
         |FROM li JOIN stats ON l_partkey = pk
         |WHERE l_quantity < avg_qty * 0.5""".stripMargin,

    "q20_ship_heavy_suppliers" ->
      s"""WITH shipped AS (
         |  SELECT l_suppkey, ${s4("l_quantity")} AS qty
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey AND p_name LIKE 'small%'
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, n_name
         |FROM supplier
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE EXISTS (
         |  SELECT 1 FROM shipped
         |  WHERE l_suppkey = s_suppkey
         |    AND qty > (SELECT ${s4("qty")}/COUNT(*) FROM shipped))
         |ORDER BY s_name""".stripMargin
  )
}
