package graft

import org.apache.spark.sql.functions._
import graft.operators.AnalyticCore

class AnalyticCoreSpec extends SparkSpecBase {

  test("every analytic query returns rows") {
    AnalyticCore.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }

  test("q1 groups by the four returnflag/linestatus combos with sane sums") {
    val rows = AnalyticCore.queries("q1_pricing_summary")(spark, sf).collect()
    assert(rows.length >= 4)
    val flags = rows.map(r => (r.getString(0), r.getString(1)))
    assert(flags.distinct.length == flags.length, "one row per (flag, status) group")
    flags.foreach { case (f, st) => assert(f.nonEmpty && st.nonEmpty) }
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("sum_qty")) > 0)
      assert(r.getLong(r.fieldIndex("count_order")) > 0)
    }
  }

  test("q1 filter is pushed down to the parquet scan") {
    val plan = AnalyticCore.queries("q1_pricing_summary")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"expected shipdate pushdown in:\n$plan")
  }

  test("q1 scan prunes to the referenced columns only") {
    val plan = AnalyticCore.queries("q1_pricing_summary")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("l_orderkey"), "q1 should not read l_orderkey")
    assert(plan.contains("l_returnflag"))
  }

  test("window rank keeps at most 3 per nation, correctly ordered") {
    val rows = AnalyticCore.queries("q_window_rank")(spark, sf).collect()
    val byNation = rows.groupBy(_.getInt(1))
    byNation.foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val bals = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(bals.sameElements(bals.sorted.reverse), "rank must follow acctbal desc")
    }
  }

  test("sessionize: session count never exceeds event count") {
    AnalyticCore.queries("q_events_sessionize")(spark, sf).collect().foreach { r =>
      assert(r.getLong(r.fieldIndex("n_sessions")) <= r.getLong(r.fieldIndex("n_events")))
      assert(r.getLong(r.fieldIndex("n_sessions")) >= 1)
    }
  }

  test("funnel stages are monotonically non-increasing") {
    val r = AnalyticCore.queries("q_events_funnel")(spark, sf).collect().head
    assert(r.getLong(0) >= r.getLong(1) && r.getLong(1) >= r.getLong(2))
  }
}
