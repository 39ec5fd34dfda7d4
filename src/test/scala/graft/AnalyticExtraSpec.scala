package graft

import graft.operators.AnalyticExtra

class AnalyticExtraSpec extends SparkSpecBase {

  test("every extra analytic query returns rows") {
    AnalyticExtra.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }

  test("q6 predicates all push to the parquet scan") {
    val plan = AnalyticExtra.queries("q6_revenue_delta")(spark, sf)
      .queryExecution.executedPlan.toString
    // PushedFilters renders truncated under AQE, so assert via the Filter
    // node's residual predicates (same predicates, untruncated).
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"), plan)
    assert(plan.contains("< 24.0)") && plan.contains(">= 0.05)"),
      s"expected quantity + discount predicates at the scan in:\n$plan")
  }

  test("q4 EXISTS decorrelates to a semi join carrying only the orderkey") {
    val plan = AnalyticExtra.queries("q4_order_priority")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected a semi join in:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)"),
      s"returnflag must be filtered at the scan, not after the join:\n$plan")
  }

  test("q12 high+low counts partition every joined row") {
    val rows = AnalyticExtra.queries("q12_priority_split")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("high_line_count")) >= 0)
      assert(r.getLong(r.fieldIndex("low_line_count")) > 0)
    }
  }

  test("q14 promo share lies in (0, 100) and parts joined broadcast") {
    val df = AnalyticExtra.queries("q14_promo_effect")(spark, sf)
    val r = df.collect().head
    val pct = r.getDouble(r.fieldIndex("promo_pct"))
    assert(pct > 0.0 && pct < 100.0, s"promo_pct=$pct")
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("q18 keeps only orders whose quantity sum clears the threshold") {
    AnalyticExtra.queries("q18_large_orders")(spark, sf).collect().foreach { r =>
      assert(r.getDouble(r.fieldIndex("sum_qty")) > 300.0)
    }
  }

  test("q19 disjunction stays one broadcast join, not a union of three") {
    val plan = AnalyticExtra.queries("q19_disjunctive")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("Union"), s"OR arms must not expand to a union:\n$plan")
  }

  test("q8 market share is a valid per-year fraction") {
    AnalyticExtra.queries("q8_market_share")(spark, sf).collect().foreach { r =>
      val share = r.getDouble(r.fieldIndex("mkt_share"))
      assert(share >= 0.0 && share <= 1.0, s"mkt_share=$share")
      assert(r.getDouble(r.fieldIndex("nation_volume")) <=
             r.getDouble(r.fieldIndex("total_volume")))
    }
  }

  test("q21 decorrelates to semi + anti joins; waits are positive") {
    val df = AnalyticExtra.queries("q21_waiting_supplier")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"),
      s"expected semi+anti decorrelation in:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(r.fieldIndex("numwait")) >= 1))
  }

  test("q2 keeps exactly the per-part minimum-cost suppliers") {
    val rows = AnalyticExtra.queries("q2_min_cost_supp")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(3)).foreach { case (_, rs) =>
      val costs = rs.map(r => r.getDouble(r.fieldIndex("unit_cost"))).distinct
      assert(costs.length == 1, "all surviving rows per part share the min cost")
    }
  }

  test("q9 profit plan broadcasts part and supplier-nation dims") {
    val df = AnalyticExtra.queries("q9_product_profit")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(df.collect().nonEmpty)
  }

  test("q11 keeps only parts above the fractional threshold of the total") {
    import org.apache.spark.sql.functions._
    val rows = AnalyticExtra.queries("q11_important_stock")(spark, sf).collect()
    assert(rows.nonEmpty)
    val minKept = rows.map(r => r.getDouble(r.fieldIndex("value"))).min
    // recompute the unfiltered total from the same nation-3 slice
    val n3 = graft.sources.Tables.supplier(spark, sf)
      .join(graft.sources.Tables.nation(spark, sf)
        .filter(col("n_name") === "NATION_3"), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val tot = graft.sources.Tables.lineitem(spark, sf)
      .join(n3, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .agg(sum(col("l_extendedprice"))).collect().head.getDouble(0)
    assert(minKept > tot * 0.001 - 1.0, s"minKept=$minKept vs ${tot * 0.001}")
  }

  test("q13 distribution covers every customer exactly once") {
    val rows = AnalyticExtra.queries("q13_order_distribution")(spark, sf).collect()
    val covered = rows.map(r => r.getLong(r.fieldIndex("custdist"))).sum
    assert(covered == graft.sources.Tables.customer(spark, sf).count(),
      "custdist buckets must partition the customer set")
    // left-outer semantics: the c_count=0 bucket holds exactly the
    // customers with no qualifying order (may legitimately be empty)
    import org.apache.spark.sql.functions._
    val withOrders = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey")).distinct().count()
    val zeroBucket = rows.find(_.getLong(0) == 0L)
      .map(r => r.getLong(r.fieldIndex("custdist"))).getOrElse(0L)
    assert(zeroBucket == covered - withOrders,
      s"zero bucket $zeroBucket vs ${covered - withOrders} orderless customers")
  }

  test("q16 never counts an excluded supplier") {
    import org.apache.spark.sql.functions._
    val excl = graft.sources.Tables.supplier(spark, sf)
      .filter(col("s_name").like("%7")).count()
    assert(excl > 0, "fixture must actually exclude someone")
    val total = graft.sources.Tables.supplier(spark, sf).count()
    AnalyticExtra.queries("q16_supplier_cnt")(spark, sf).collect().foreach { r =>
      assert(r.getLong(r.fieldIndex("supplier_cnt")) <= total - excl)
    }
  }

  test("q20 heavy shippers are above the average shipped volume") {
    import org.apache.spark.sql.functions._
    val rows = AnalyticExtra.queries("q20_ship_heavy_suppliers")(spark, sf).collect()
    assert(rows.nonEmpty)
    val p = graft.sources.Tables.part(spark, sf)
      .filter(col("p_name").like("small%")).select(col("p_partkey"))
    val shipped = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
              col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey")).agg(sum(col("l_quantity")).as("qty"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val thr = shipped.values.sum / shipped.size
    rows.foreach { r =>
      val sk = r.getLong(r.fieldIndex("s_suppkey"))
      assert(shipped(sk) > thr - 1.0, s"supplier $sk shipped ${shipped(sk)} vs avg $thr")
    }
  }

  test("q22 idle customers are all above the positive-balance average") {
    import org.apache.spark.sql.functions._
    val thr = graft.sources.Tables.customer(spark, sf)
      .filter(col("c_acctbal") > 0.0)
      .agg(avg(col("c_acctbal"))).collect().head.getDouble(0)
    AnalyticExtra.queries("q22_idle_customers")(spark, sf).collect().foreach { r =>
      val n = r.getLong(r.fieldIndex("numcust"))
      val tot = r.getDouble(r.fieldIndex("totacctbal"))
      assert(n > 0)
      // every member is above thr, so the mean must be too (thr is within
      // 1e-4 of the portable fixed-point threshold the query used)
      assert(tot / n > thr - 1.0, s"segment mean ${tot / n} vs thr $thr")
    }
  }
}
