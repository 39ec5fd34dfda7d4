package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Portable._
import graft.sources.Tables

/** §2 D/E extensions — operators beyond the reference's literal surface
  * that its users (and any 100 TB pipeline) reach for next: as-of joins,
  * grouping sets, per-group top-k, pivots, histograms, sampled
  * reconciliation, and duplicate-cluster resolution.
  */
object ExtendedSuite {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> { (s, d) =>
      // As-of join: each purchase matched to the same user's latest view
      // at-or-before it. Spark lacks a native as-of join; the scalable
      // formulation is union + ordered window (one shuffle on user_id,
      // no range-join pair explosion): tag streams, sort by time, carry
      // the last view timestamp forward with last_value(ignoreNulls).
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"),
          col("event_id"))
      val tagged = e.filter(col("event_type").isin("view", "purchase"))
      // views sort BEFORE purchases on timestamp ties so a same-tus view
      // is visible to the purchase row — matching ASOF `view_tus <=
      // purchase_tus` semantics (<= includes equality).
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tus"),
          when(col("event_type") === "view", lit(0)).otherwise(lit(1)),
          col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("last_view_tus",
          last(when(col("event_type") === "view", col("tus")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"), col("tus").as("purchase_tus"),
          col("last_view_tus"))
        .orderBy("user_id", "purchase_id")
    },

    "q_asof_join_native" -> { (s, d) =>
      // The same as-of semantics through graft's custom whole-operator
      // plan (AsofJoin logical node → AsofJoinStrategy → AsofJoinExec
      // merge; org.apache.spark.sql.graft.AsofJoin) instead of the
      // union+window formulation: Catalyst places one hash-cluster
      // exchange + sort per side, then a per-partition O(1)-state merge
      // joins each purchase to the latest at-or-before view. Shares the
      // DuckDB ASOF LEFT JOIN oracle with q_asof_join.
      val purchases = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          unix_micros(col("ts")).as("purchase_tus"))
      val views = Tables.events(s, d)
        .filter(col("event_type") === "view")
        .select(col("user_id").as("v_user_id"), unix_micros(col("ts")).as("view_tus"))
      org.apache.spark.sql.graft.GraftAsof
        .asofJoin(purchases, views, "user_id", "v_user_id", "purchase_tus", "view_tus")
        .select(col("user_id"), col("purchase_id"), col("purchase_tus"),
          col("view_tus").as("last_view_tus"))
        .orderBy("user_id", "purchase_id")
    },

    "q_asof_forward" -> { (s, d) =>
      // Forward as-of through the same native merge (times negated —
      // see Graft.asofJoinForward): each view matched to the user's
      // NEXT purchase at-or-after it (conversion attribution). Shares
      // the exec's plan shape; oracle is DuckDB's forward ASOF (>=).
      val views = Tables.events(s, d)
        .filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          unix_micros(col("ts")).as("view_tus"))
      val purchases = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user_id"), unix_micros(col("ts")).as("purchase_tus"))
      graft.api.Graft
        .asofJoinForward(views, purchases, "user_id", "p_user_id", "view_tus", "purchase_tus")
        .select(col("user_id"), col("view_id"), col("view_tus"),
          col("purchase_tus").as("next_purchase_tus"))
        .orderBy("user_id", "view_id")
    },

    "q_interval_join" -> { (s, d) =>
      // Range/interval join — the other relational operator Spark lacks
      // a dedicated node for: views within the 30 minutes BEFORE each
      // purchase by the same user. The scalable formulation keys the
      // join on user_id (equality → shuffle/sort-merge) with the time
      // band as a residual predicate — never a time×time pair explosion,
      // because the equality key carries the join. 30 min = 1.8e9 µs.
      val p = Tables.events(s, d).filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          unix_micros(col("ts")).as("ptus"))
      val v = Tables.events(s, d).filter(col("event_type") === "view")
        .select(col("user_id").as("vuser"), unix_micros(col("ts")).as("vtus"))
      p.join(v, col("vuser") === col("user_id") &&
          col("vtus") > col("ptus") - lit(1800000000L) && col("vtus") <= col("ptus"),
          "left")
        .groupBy(col("user_id"), col("purchase_id"), col("ptus"))
        .agg(count(col("vtus")).as("n_views_30m"))
        .orderBy("user_id", "purchase_id")
    },

    "q_grouping_sets" -> { (s, d) =>
      // cube = all grouping sets over (returnflag, linestatus)
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_price"))
        .orderBy("rf", "ls")
    },

    "q_topk_per_group" -> { (s, d) =>
      // top-3 orders per market segment — WindowGroupLimit pushes the
      // limit below the shuffle (partial top-k per partition).
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("c_mktsegment"), col("rk"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("c_mktsegment", "rk")
    },

    "q_pivot" -> { (s, d) =>
      // daily event-type matrix; pivot compiles to conditional aggregation
      // (one shuffle on the date key), which is also the portable oracle.
      Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
        .count()
        .na.fill(0L)
        .orderBy("day")
    },

    "q_unpivot" -> { (s, d) =>
      // the inverse reshape: the wide daily matrix melts back to
      // (day, event_type, n) rows via stack — a zero-shuffle projection
      // over the pivoted input (the only exchanges are the pivot's own
      // aggregate and the output sort); dropping the zero-filled cells
      // restores the sparse long form exactly.
      queries("q_pivot")(s, d)
        .select(col("day"), expr(
          """stack(5, 'view', view, 'click', click, 'purchase', purchase,
            |         'signup', signup, 'error', error)
            |  AS (event_type, n)""".stripMargin))
        .filter(col("n") > 0)
        .orderBy("day", "event_type")
    },

    "q_histogram" -> { (s, d) =>
      // fixed-width histogram of order totals: integer bucket arithmetic,
      // map-side combinable.
      Tables.orders(s, d)
        .groupBy((floor(col("o_totalprice") / 50000.0)).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_total"))
        .orderBy("bucket")
    },

    "recon_sampled" -> { (s, d) =>
      // sampled checksum reconciliation: deterministic 1/16 sample by pk
      // hash (portable — not TABLESAMPLE, whose sampling is engine
      // random), the cheap first-pass the reference schedules hourly
      // (ref: scheduler/jobs.py) before escalating to full checksums.
      val sampled = Tables.orders(s, d)
        .filter(rowHash60(col("o_orderkey").cast("string")) % 16 === 0)
      sampled.agg(
          count(lit(1)).as("sample_rows"),
          checksumAgg(rowStr(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))).as("sample_checksum"))
        .select(lit("orders").as("table_name"), col("sample_rows"), col("sample_checksum"))
    },

    "q_session_window" -> { (s, d) =>
      // Spark's native gap-based session_window operator — per-user
      // session count must agree with the lag/gap formulation in
      // q_events_sessionize, which is the oracle.
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("evts"))
        .groupBy(col("user_id"))
        .agg(sum(col("evts")).as("n_events"), count(lit(1)).as("n_sessions"))
        .orderBy("user_id")
    },

    "q_running_total" -> { (s, d) =>
      // cumulative windowed sum per customer over order history
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          (sum(floor(col("o_totalprice") * lit(10000.0) + lit(0.5))).over(w)
            .cast("double") / 10000.0).as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    },

    "q_approx_distinct" -> { (s, d) =>
      // HLL-sketch distinct counts (rows-only: sketch internals are
      // engine-specific; ApproxSpec bounds the error vs exact)
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx_customers"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    },

    "q_skew_join_salted" -> { (s, d) =>
      // Skew mitigation by salting (SURVEY §5): the probe side carries a
      // deterministic salt, the build side replicates once per salt, and
      // the join key becomes (key, salt) — a hot key's rows spread over
      // SALT partitions instead of one. Result must equal the unsalted
      // join, which is the oracle.
      val SALT = 4
      val l = Tables.lineitem(s, d)
        .withColumn("salt", (col("l_linenumber") % SALT).cast("int"))
      val o = Tables.orders(s, d)
        .withColumn("salt", explode(array((0 until SALT).map(lit): _*)))
      l.join(o, col("l_orderkey") === col("o_orderkey") && l("salt") === o("salt"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy("o_orderpriority")
    },

    "text_filter_pipeline" -> { (s, d) =>
      // the classic pretraining corpus filter: quality gates + langid →
      // per-language kept/dropped accounting. Composes the TextSuite
      // signals in one narrow pass over the corpus.
      val docs = Tables.documents(s, d)
        .withColumn("words", split(col("text"), " "))
        .withColumn("n_words", size(col("words")))
        .withColumn("n_stop", size(filter(col("words"),
          w => w.isin("the", "a", "and", "of", "to"))))
        .withColumn("n_punct", size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9 ]"), lit(0))))
        .withColumn("keep",
          col("n_words").between(20, 1000) &&
          (col("n_stop").cast("double") / col("n_words")) >= 0.01 &&
          (col("n_punct").cast("double") / length(col("text"))) <= 0.2)
      docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("keep"), col("n_words")).otherwise(0L)).as("kept_words"))
        .orderBy("lang")
    },

    "text_ngram_stats" -> { (s, d) =>
      // corpus-level n-gram frequencies (LM-data staple): explode word
      // bigrams → count → top-50. The explode-then-count shape is one
      // shuffle with map-side combine; key cardinality (distinct bigrams)
      // bounds state, not corpus size.
      val docs = Tables.documents(s, d)
        .withColumn("ws", split(lower(col("text")), " "))
        .filter(size(col("ws")) >= 2)
      docs.select(explode(expr(
          """transform(sequence(1, size(ws) - 1),
            |  i -> concat_ws(' ', element_at(ws, i), element_at(ws, i+1)))""".stripMargin))
          .as("bigram"))
        .groupBy(col("bigram"))
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("bigram"))
        .limit(50)
    },

    "q_decile_stats" -> { (s, d) =>
      // RFM-style customer-spend deciles: aggregate spend per customer,
      // exact decile assignment with a deterministic tiebreak,
      // per-decile rollup. A bare ntile window is UNPARTITIONED — the
      // entire customer dimension sorts on one task; instead the
      // distributed-selection kernel (Graft.rankedByGroup, empty group
      // = one global ranking) ranks across all tasks and the decile is
      // derived from (rn, cnt) with ntile's exact bucket arithmetic
      // (first cnt%10 buckets take the extra row), so the result —
      // and the DuckDB ntile oracle — are unchanged. The
      // approx_percentile twin (Graft.decileStatsApprox) remains the
      // one-pass variant; this is the exact one, now also
      // any-dimension-size.
      val spend = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(dsum(col("o_totalprice")).as("spend"))
      graft.api.Graft
        .rankedByGroup(spend, Seq.empty, Seq(desc("spend"), col("o_custkey")))
        .withColumn("decile", expr(
          """CASE WHEN rn <= (cnt % 10) * (cnt div 10 + 1)
            |THEN (rn - 1) div (cnt div 10 + 1) + 1
            |ELSE (cnt % 10) + (rn - (cnt % 10) * (cnt div 10 + 1) - 1) div (cnt div 10) + 1
            |END""".stripMargin).cast("long"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("spend")).as("decile_spend"),
          min(col("spend")).as("min_spend"), max(col("spend")).as("max_spend"))
        .orderBy("decile")
    },

    "events_gap_histogram" -> { (s, d) =>
      // inter-event-time distribution (the arrival-process health stat a
      // feed monitor tracks): per-user lag() gap in integer µs, bucketed
      // into fixed ranges. The window partitions by user — fully
      // parallel — and the histogram is one small group-by.
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
        .withColumn("gap_us", col("tus") - lag(col("tus"), 1).over(w))
        .filter(col("gap_us").isNotNull)
        .withColumn("bucket_ord",
          when(col("gap_us") < 10000000L, 0L).when(col("gap_us") < 60000000L, 1L)
            .when(col("gap_us") < 600000000L, 2L).when(col("gap_us") < 3600000000L, 3L)
            .otherwise(4L))
        .withColumn("bucket",
          when(col("bucket_ord") === 0L, "lt_10s").when(col("bucket_ord") === 1L, "s10_60")
            .when(col("bucket_ord") === 2L, "m1_10").when(col("bucket_ord") === 3L, "m10_60")
            .otherwise("ge_1h"))
        .groupBy(col("bucket_ord"), col("bucket"))
        .agg(count(lit(1)).as("n_gaps"), countDistinct(col("user_id")).as("n_users"))
        .orderBy("bucket_ord")
    },

    "events_retention" -> { (s, d) =>
      // day-over-day cohort retention: users active on day D who return
      // on D+1. Distinct (user, day) first, then a self-join on
      // (user, day+1) — both shuffles key on user/day, no skew.
      val ud = Tables.events(s, d)
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .distinct()
      val next = ud.select(col("user_id").as("uid2"),
        (col("day") - expr("INTERVAL 1 DAY")).as("day"))
      ud.as("a").join(next.as("b"),
          col("a.day") === col("b.day") && col("a.user_id") === col("b.uid2"), "left")
        .groupBy(col("a.day").as("day"))
        .agg(countDistinct(col("a.user_id")).as("active_users"),
          countDistinct(col("b.uid2")).as("retained_users"))
        .orderBy("day")
    },

    "q_range_join_binned" -> { (s, d) =>
      // PURE range join — no equality key anywhere: purchases falling
      // inside 10-minute outage windows opened by error events. A bare
      // inequality join would plan as BroadcastNestedLoopJoin (quadratic
      // at scale); Graft.rangeJoinBinned explodes each window into the
      // <= 2 bins it overlaps and equality-joins on the bin, keeping the
      // shuffle hash-partitioned. Counts per window; inner semantics.
      val binUs = 600000000L
      val windows = Tables.events(s, d).filter(col("event_type") === "error")
        .select(col("event_id").as("win_id"),
          unix_micros(col("ts")).as("w_start"))
        .withColumn("w_end", col("w_start") + lit(binUs))
      val purchases = Tables.events(s, d).filter(col("event_type") === "purchase")
        .select(col("event_id"), unix_micros(col("ts")).as("tus"))
      graft.api.Graft.rangeJoinBinned(purchases, windows,
          "tus", "w_start", "w_end", binUs)
        .groupBy(col("win_id"))
        .agg(count(lit(1)).as("n_in_window"))
        .orderBy("win_id")
    },

    "events_anomaly" -> { (s, d) =>
      // rate-spike detection on the event feed: a (type, day) cell is
      // anomalous when its count exceeds 1.5× the type's mean daily
      // count. The test is the integer cross-multiply
      // 2·n·active_days > 3·total — no division, no floats, portable,
      // overflow-safe (day counts × day cardinality stay far under
      // 2^62). Two aggregate shuffles (cell, then per-type rollup) and
      // a broadcast of the tiny per-type stats back onto the cells —
      // the same monitoring rollup shape at any feed size.
      // localCheckpoint: the stats rollup and the final join both read
      // the (type, day) cells — one events scan, blocks auto-released
      val cells = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val stats = cells.groupBy(col("event_type").as("et"))
        .agg(sum(col("n")).as("total"), count(lit(1)).as("active_days"))
      cells.join(broadcast(stats), col("event_type") === col("et"))
        .withColumn("is_spike",
          col("n") * 2 * col("active_days") > col("total") * 3)
        .select(col("event_type"), col("day"), col("n"), col("active_days"),
          col("total"), col("is_spike"))
        .orderBy("event_type", "day")
    },

    "events_anomaly_online" -> { (s, d) =>
      // ONLINE spike detection: a (type, day) cell compares against the
      // running mean of STRICTLY PRIOR days only — the causal variant a
      // live monitor computes (no future data). Integer-free-of-floats:
      // the window sums counts and days, and the gate is the cross-
      // multiply 2·n·prior_days > 3·prior_total. The first day of each
      // type has no history and is never flagged. One cell shuffle +
      // one per-type window sort — monitoring-rollup sized.
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .withColumn("prior_total", sum(col("n")).over(w))
        .withColumn("prior_days", count(col("n")).over(w))
        .withColumn("is_spike",
          col("prior_days") > 0 &&
            col("n") * 2 * col("prior_days") > col("prior_total") * 3)
        .na.fill(0L, Seq("prior_total"))
        .orderBy("event_type", "day")
    },

    "q_correlated_subquery" -> { (s, d) =>
      // correlated-aggregate shape: customers whose balance beats their
      // segment average — window-average formulation (one shuffle on the
      // segment key, no per-row subquery execution).
      val w = Window.partitionBy(col("c_mktsegment"))
      Tables.customer(s, d)
        .withColumn("seg_sum", sum(floor(col("c_acctbal") * 10000.0 + 0.5)).over(w))
        .withColumn("seg_n", count(lit(1)).over(w))
        .withColumn("seg_avg", col("seg_sum").cast("double") / 10000.0 / col("seg_n"))
        .filter(col("c_acctbal") > col("seg_avg"))
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          col("seg_avg"))
        .orderBy("c_custkey")
    },

    "q_window_range" -> { (s, d) =>
      // RANGE-frame window: 7-day trailing revenue per day (vs the
      // ROWS frames used elsewhere). Frame bounds are value-based on
      // the epoch-day key, so gaps in the calendar are handled.
      val daily = Tables.orders(s, d)
        // parquet gives TIMESTAMP_NTZ; cast to TIMESTAMP (UTC session) for unix_micros
        .groupBy((unix_micros(col("o_orderdate").cast("timestamp")) / lit(86400000000L))
          .cast("long").as("epoch_day"))
        .agg(sum(floor(col("o_totalprice") * 10000.0 + 0.5)).as("rev_fp"))
      val w = Window.orderBy(col("epoch_day")).rangeBetween(-6, 0)
      daily
        .select(col("epoch_day"),
          (col("rev_fp").cast("double") / 10000.0).as("day_revenue"),
          (sum(col("rev_fp")).over(w).cast("double") / 10000.0).as("trailing_7d_revenue"))
        .orderBy("epoch_day")
    },

    "q_set_ops" -> { (s, d) =>
      // EXCEPT / INTERSECT semantics over customer key sets: customers
      // with orders vs customers with big orders.
      val withOrders = Tables.orders(s, d).select(col("o_custkey").as("k")).distinct()
      val withBig = Tables.orders(s, d).filter(col("o_totalprice") > 300000.0)
        .select(col("o_custkey").as("k")).distinct()
      val exceptN = withOrders.except(withBig).agg(count(lit(1)).as("n"))
        .withColumn("set_op", lit("except"))
      val intersectN = withOrders.intersect(withBig).agg(count(lit(1)).as("n"))
        .withColumn("set_op", lit("intersect"))
      val unionN = withOrders.union(withBig).distinct().agg(count(lit(1)).as("n"))
        .withColumn("set_op", lit("union"))
      exceptN.unionByName(intersectN).unionByName(unionN)
        .select("set_op", "n")
        .orderBy("set_op")
    },

    "dedup_cluster" -> { (s, d) =>
      // duplicate-cluster resolution: connected components over verified
      // duplicate pairs — the distributed union-find a dedup pipeline
      // runs after pair generation. Delegates to the public kernel's
      // large-star/small-star alternation: O(log) rounds regardless of
      // component diameter (min-label propagation was O(diameter) —
      // unbounded on a pathological near-dup chain at corpus scale).
      val pairs = DedupSuite.queries("dedup_minhash_lsh")(s, d)
        .select(col("doc_a"), col("doc_b"))
        .localCheckpoint()
      val clusters = graft.api.Graft.duplicateClusters(pairs, "doc_a", "doc_b")
      pairs.unpersist()
      clusters
    },

    "events_user_path" -> { (s, d) =>
      // Path analysis: the 10 most common 3-step event sequences.
      // Two lead() calls share ONE window sort (single shuffle on
      // user_id), then a count group-by with map-side combine — no
      // per-user collect_list buffering, so a power user with millions
      // of events never materializes as one array.
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("tus"), col("event_type"))
        .withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .filter(col("e3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("path"))
        .limit(10)
    },

    "q_median_by_group" -> { (s, d) =>
      // Exact per-group median, engine-portably: prices become integer
      // cents, the median is the value (odd n) or sum (even n) of the
      // middle ranks — rank selection is deterministic over the sorted
      // multiset even with duplicate values. (Spark's
      // percentile/approx_percentile interpolate differently from
      // DuckDB's quantile — rank arithmetic sidesteps that entirely.)
      //
      // Shape: DISTRIBUTED SELECTION via Graft.rankedByGroup, not a
      // per-group rank window — a window partitioned by the 5-value
      // group key sorts each group on ONE task (5 busy tasks at any
      // cluster size) and buffers whole partitions for its count
      // frame; the sf1→sf10 wall gate flagged exactly that (20.8× for
      // 10× data; the kernel measures 4.4×).
      val base = Tables.orders(s, d).select(col("o_orderpriority").as("prio"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      graft.api.Graft.rankedByGroup(base, Seq("prio"), Seq(col("cents")))
        .filter(col("rn") === expr("(cnt + 1) div 2") || col("rn") === expr("(cnt + 2) div 2"))
        .withColumn("wt",
          when(expr("(cnt + 1) div 2 = (cnt + 2) div 2"), lit(2L)).otherwise(lit(1L)))
        .groupBy("prio")
        .agg(sum(col("cents") * col("wt")).as("median_cents_x2"),
          max(col("cnt")).as("n_orders"))
        .orderBy("prio")
    },

    "q_events_sliding" -> { (s, d) =>
      // Sliding-window counts (1 h window, 30 min slide) — the batch
      // twin of a sliding streaming agg: the window() generator lands
      // each event in exactly window/slide = 2 windows, then one
      // group-by with map-side combine. Event expansion factor is the
      // overlap ratio (2×), constant at any scale.
      Tables.events(s, d)
        .select(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .groupBy(unix_micros(col("w.start")).as("w_start"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("w_start", "event_type")
    },

    "q_events_dau_wau" -> { (s, d) =>
      // DAU / WAU engagement rollup with the stickiness ratio — the
      // canonical activity dashboard. Days and weeks are integer
      // epoch-day arithmetic (div, no timezone/date functions to
      // diverge on); stickiness is exact ppm integer division. Two
      // distinct-aggregates over the same narrow projection, joined on
      // the tiny week key.
      val e = Tables.events(s, d).select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      val dau = e.groupBy("day").agg(countDistinct(col("user_id")).as("dau"))
        .withColumn("week", expr("day div 7"))
      val wau = e.withColumn("week", expr("day div 7"))
        .groupBy("week").agg(countDistinct(col("user_id")).as("wau"))
      dau.groupBy("week").agg(sum(col("dau")).as("sum_dau"), count(lit(1)).as("n_days"))
        .join(wau, Seq("week"))
        .select(col("week"), col("n_days"), col("sum_dau"), col("wau"),
          expr("sum_dau * 1000000 div (n_days * wau)").as("stickiness_ppm"))
        .orderBy("week")
    },

    "events_windowed_funnel" -> { (s, d) =>
      // Time-bounded conversion funnel: did the user purchase within
      // 1 h of their FIRST view — the attribution-window variant of
      // q_events_funnel's unbounded version. Two keyed aggregations +
      // one equi-join on user_id (AQE-broadcastable); the window test
      // is a per-row range check, not a range join.
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("tus").as("t_view"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("tus").as("t_buy"))
      v.join(p, Seq("user_id"), "left")
        .groupBy(col("user_id"), col("t_view"))
        .agg(max(when(col("t_buy").between(col("t_view"), col("t_view") + 3600000000L), 1L)
          .otherwise(0L)).as("conv"))
        .agg(count(lit(1)).as("n_viewers"), sum(col("conv")).as("n_converted_1h"),
          expr("CAST(sum(conv) * 1000000 div count(1) AS BIGINT)").as("conv_ppm"))
    },

    "mm_shard_manifest" -> { (s, d) =>
      // Byte-budget shard manifest for binary media (the tar-shard /
      // webdataset layout step): blobs stream into 64 KiB shards in
      // deterministic (media_type, doc_id) order, a blob straddling a
      // boundary starts in its offset's shard — same concat-split
      // semantics as text_token_shards, over bytes. One per-type
      // window + one group-by; manifest rows are what the shard
      // writer consumes.
      val media = Tables.documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 2 === 0, lit("image")).otherwise(lit("audio")).as("media_type"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
      val w = Window.partitionBy(col("media_type")).orderBy(col("doc_id"))
      media.withColumn("cum", sum(col("n_bytes")).over(w))
        .withColumn("shard_id", expr("(cum - n_bytes) div 65536"))
        .groupBy("media_type", "shard_id")
        .agg(count(lit(1)).as("n_items"), sum(col("n_bytes")).as("shard_bytes"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy("media_type", "shard_id")
    },

    "q_quartiles_by_group" -> { (s, d) =>
      // Nearest-rank (percentile_disc) quartiles per group — the same
      // rank-arithmetic family as q_median_by_group, generalized: the
      // k-th quartile is the value at rank ceil(n·k/4) of the sorted
      // multiset. Conditional aggregation picks all three in the same
      // single-sort pass; no percentile interpolation, so Spark and
      // DuckDB agree exactly.
      // Distributed-selection ranks (Graft.rankedByGroup) — same scale
      // rationale as q_median_by_group: per-group windows cap
      // parallelism at the group count.
      val base = Tables.orders(s, d).select(col("o_orderpriority").as("prio"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      graft.api.Graft.rankedByGroup(base, Seq("prio"), Seq(col("cents")))
        .groupBy("prio")
        .agg(
          max(when(col("rn") === expr("(cnt * 1 + 3) div 4"), col("cents"))).as("p25_cents"),
          max(when(col("rn") === expr("(cnt * 2 + 3) div 4"), col("cents"))).as("p50_cents"),
          max(when(col("rn") === expr("(cnt * 3 + 3) div 4"), col("cents"))).as("p75_cents"),
          max(col("cnt")).as("n_orders"))
        .orderBy("prio")
    },

    "q_corr_by_group" -> { (s, d) =>
      // Statistical moments per group — variance and Pearson correlation
      // of (quantity, price-cents) — computed ENGINE-PORTABLY: the five
      // power sums are exact integers (DECIMAL(38,0) accumulation, no
      // float reduction order), converted to double only inside the
      // final closed-form formula where every op is a single IEEE
      // computation. Spark's covar/corr aggregates stream partial
      // doubles (order-dependent) — the exact-sums route is what makes
      // the result hash-checkable across engines. One shuffle, map-side
      // partial sums.
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val base = Tables.lineitem(s, d).select(col("l_returnflag").as("flag"),
        col("l_quantity").cast("long").as("x"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("y"))
      base.groupBy("flag")
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
          sum((col("x") * col("x")).cast(dec)).as("sxx"),
          sum((col("y") * col("y")).cast(dec)).as("syy"),
          sum((col("x") * col("y")).cast(dec)).as("sxy"))
        .select(col("flag"), col("n"),
          (col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double")).as("vx"),
          (col("n").cast("double") * col("syy").cast("double")
            - col("sy").cast("double") * col("sy").cast("double")).as("vy"),
          (col("n").cast("double") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double")).as("cxy"))
        // degenerate (zero-variance) groups emit NULL correlation rather
        // than NaN — NaN casts to 0L in Spark but errors/nulls in the
        // oracle's FLOOR/CAST, a latent engine divergence
        .select(col("flag"), col("n"),
          when(col("vx") > 0 && col("vy") > 0,
            floor(col("cxy") / sqrt(col("vx") * col("vy")) * lit(1e6) + lit(0.5))
              .cast("long")).as("corr_e6"),
          floor(col("vx") / (col("n").cast("double") * col("n").cast("double"))
            * lit(100.0) + lit(0.5)).cast("long").as("var_x_e2"))
        .orderBy("flag")
    },

    "q_cube" -> { (s, d) =>
      // CUBE completes the multi-level aggregate family (rollup and
      // grouping sets are already in the surface): all 4 grouping
      // combinations in one pass via partial aggregation — Spark
      // expands the grouping sets before the single shuffle.
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"))
        .orderBy("returnflag", "linestatus")
    },

    "events_attribution" -> { (s, d) =>
      // Last-touch attribution: each purchase credits the most recent
      // prior non-purchase event (its "channel"); purchases with no
      // prior touch are 'direct'. One window sort on user_id carries
      // the whole computation — the IGNORE-NULLS last() streams over
      // the frame, no per-user buffering — then a tiny channel rollup
      // with map-side combine. Revenue goes through the fixed-point
      // dsum so both engines sum exact integers.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tus"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("tus"), col("event_type"), col("value"))
        .withColumn("channel",
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("channel"), lit("direct")).as("channel"))
        .agg(count(lit(1)).as("n_purchases"), dsum(col("value")).as("revenue"))
        .orderBy("channel")
    },

    "events_markov" -> { (s, d) =>
      // First-order Markov transition matrix over per-user event
      // sequences — the behavioral fingerprint behind path mining and
      // anomaly scoring. lead() shares one window sort on user_id;
      // the (src,dst) rollup is 25 cells at any corpus size, so the
      // per-src normalizing window is ~free. Probabilities are exact
      // integer ppm (floor division on BIGINTs) — no doubles to
      // diverge between engines.
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      val wsrc = Window.partitionBy(col("src"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("tus"), col("event_type"))
        .withColumn("dst", lead(col("event_type"), 1).over(w))
        .filter(col("dst").isNotNull)
        .groupBy(col("event_type").as("src"), col("dst"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p_ppm", expr("n * 1000000 div sum(n) over (partition by src)"))
        .select(col("src"), col("dst"), col("n"), col("p_ppm"))
        .orderBy("src", "dst")
    },

    "events_ks_drift" -> { (s, d) =>
      // Two-sample Kolmogorov–Smirnov drift between user cohorts
      // (even/odd user_id stands in for before/after deploy), per
      // event type: D = max |ECDF_a − ECDF_b| over the value
      // distribution. Values quantize to integer cents, the ECDF gap
      // is the exact cross-multiplied integer |cum_a·n_b − cum_b·n_a|
      // (one double never appears until the final ppm), and the whole
      // statistic is one group-by plus one window over the ~distinct
      // cents — never a sort of the raw events. Products stay under
      // 2^60 to well past 10^8 events per type per cohort.
      val wc = Window.partitionBy(col("event_type")).orderBy(col("cents"))
      val wt = Window.partitionBy(col("event_type"))
      Tables.events(s, d)
        .select(col("event_type"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"),
          (col("user_id") % 2).as("g"))
        .groupBy(col("event_type"), col("cents"))
        .agg(sum(when(col("g") === 0, 1L).otherwise(0L)).as("ca"),
          sum(when(col("g") === 1, 1L).otherwise(0L)).as("cb"))
        .withColumn("cum_a", sum(col("ca")).over(wc))
        .withColumn("cum_b", sum(col("cb")).over(wc))
        .withColumn("n_a", sum(col("ca")).over(wt))
        .withColumn("n_b", sum(col("cb")).over(wt))
        .groupBy(col("event_type"))
        .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
          max(abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a"))).as("dnum"))
        .select(col("event_type"), col("n_a"), col("n_b"),
          expr("dnum * 1000000 div (n_a * n_b)").as("ks_ppm"))
        .orderBy("event_type")
    },

    "events_cohort_matrix" -> { (s, d) =>
      // Weekly cohort-retention matrix — the growth-analytics triangle:
      // users grouped by FIRST-activity week, tracked across week
      // offsets. Scale shape: one distinct to (user, week) (the only
      // corpus-sized shuffle), per-user min for the cohort (map-side
      // combine), then user-keyed join + (cohort, offset) rollup whose
      // cardinality is weeks² regardless of corpus size. Weeks are
      // integer epoch-day div 7 and retention is integer ppm — no
      // calendar or float divergence between engines.
      val uw = Tables.events(s, d)
        .select(col("user_id"), expr("unix_micros(ts) div 86400000000 div 7").as("wk"))
        .distinct()
      val cohort = uw.groupBy("user_id").agg(min(col("wk")).as("cw"))
      val sizes = cohort.groupBy(col("cw")).agg(count(lit(1)).as("cohort_size"))
      uw.join(cohort, "user_id")
        .groupBy(col("cw").as("cohort_week"), (col("wk") - col("cw")).as("week_offset"))
        .agg(count(lit(1)).as("n_active"))
        .join(sizes.withColumnRenamed("cw", "cohort_week"), "cohort_week")
        .select(col("cohort_week"), col("week_offset"), col("n_active"), col("cohort_size"),
          expr("n_active * 1000000 div cohort_size").as("retention_ppm"))
        .orderBy("cohort_week", "week_offset")
    },

    "events_rolling_active" -> { (s, d) =>
      // Trailing 7-day active users per day — the rolling-distinct
      // that a naive RANGE window can't do (distinct isn't
      // decomposable). Scale shape: dedup to (user, day) first (the
      // only corpus-sized shuffle), explode each activity day into the
      // ≤7 window-days it serves (constant fan-out), then
      // count-distinct per window-day. Cost is 7× the DAILY actives,
      // never a self-join of days × events.
      val daily = Tables.events(s, d)
        .select(expr("unix_micros(ts) div 86400000000").as("day"), col("user_id"))
        .distinct()
      val dau = daily.groupBy("day").agg(countDistinct(col("user_id")).as("dau"))
      val win = daily
        .select(explode(expr("sequence(day, day + 6)")).as("day"), col("user_id"))
        .groupBy("day").agg(countDistinct(col("user_id")).as("active_7d"))
      dau.join(win, Seq("day")).orderBy("day")
    }
  )

  /** Shared by the batch session_window op and its streaming twin.
    * Gap-equality note: session_window ends are exclusive, so a gap of
    * exactly 30 min starts a NEW session → '>=' here (vs '>' in
    * q_events_sessionize's convention).
    */
  private[graft] val SessionOracleSql =
    """WITH m AS (
      |  SELECT user_id, epoch_us(ts) AS tus,
      |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev
      |  FROM events)
      |SELECT user_id, COUNT(*) AS n_events,
      |  CAST(SUM(CASE WHEN prev IS NULL OR tus - prev >= 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
      |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Shared by the composed and native as-of formulations. */
  private val AsofOracleSql =
    """WITH p AS (
      |  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS purchase_tus
      |  FROM events WHERE event_type = 'purchase'),
      |v AS (
      |  SELECT user_id, epoch_us(ts) AS view_tus FROM events WHERE event_type = 'view')
      |SELECT p.user_id AS user_id, purchase_id, purchase_tus,
      |  v.view_tus AS last_view_tus
      |FROM p ASOF LEFT JOIN v
      |  ON p.user_id = v.user_id AND v.view_tus <= p.purchase_tus
      |ORDER BY user_id, purchase_id""".stripMargin

  def oracles: Map[String, String] = Map(
    "q_asof_join" -> AsofOracleSql,

    "q_asof_join_native" -> AsofOracleSql,

    "q_asof_forward" ->
      """WITH v AS (
        |  SELECT user_id, event_id AS view_id, epoch_us(ts) AS view_tus
        |  FROM events WHERE event_type = 'view'),
        |p AS (
        |  SELECT user_id, epoch_us(ts) AS purchase_tus
        |  FROM events WHERE event_type = 'purchase')
        |SELECT v.user_id AS user_id, view_id, view_tus,
        |  p.purchase_tus AS next_purchase_tus
        |FROM v ASOF LEFT JOIN p
        |  ON v.user_id = p.user_id AND p.purchase_tus >= v.view_tus
        |ORDER BY user_id, view_id""".stripMargin,

    "q_interval_join" ->
      """WITH p AS (
        |  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS ptus
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT user_id AS vuser, epoch_us(ts) AS vtus FROM events WHERE event_type = 'view')
        |SELECT user_id, purchase_id, ptus, COUNT(vtus) AS n_views_30m
        |FROM p LEFT JOIN v
        |  ON vuser = user_id AND vtus > ptus - 1800000000 AND vtus <= ptus
        |GROUP BY user_id, purchase_id, ptus
        |ORDER BY user_id, purchase_id""".stripMargin,


    "q_grouping_sets" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
         |  COALESCE(l_linestatus, 'ALL') AS ls,
         |  COUNT(*) AS n,
         |  CAST(SUM(CAST(FLOOR((l_extendedprice)*10000 + 0.5) AS BIGINT)) AS DOUBLE)/10000.0 AS sum_price
         |FROM lineitem
         |GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY rf, ls""".stripMargin,

    "q_topk_per_group" ->
      """SELECT c_mktsegment, rk, o_orderkey, o_totalprice FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders JOIN customer ON o_custkey = c_custkey) t
        |WHERE rk <= 3
        |ORDER BY c_mktsegment, rk""".stripMargin,

    "q_pivot" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |  COUNT(*) FILTER (WHERE event_type = 'view') AS view,
        |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (WHERE event_type = 'error') AS error
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,

    "q_unpivot" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |  event_type, COUNT(*) AS n
        |FROM events
        |WHERE event_type IN ('view', 'click', 'purchase', 'signup', 'error')
        |GROUP BY 1, 2
        |ORDER BY day, event_type""".stripMargin,

    "q_histogram" ->
      s"""SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
         |  COUNT(*) AS n,
         |  CAST(SUM(CAST(FLOOR((o_totalprice)*10000 + 0.5) AS BIGINT)) AS DOUBLE)/10000.0 AS sum_total
         |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,

    "recon_sampled" ->
      """SELECT 'orders' AS table_name, COUNT(*) AS sample_rows,
        |  CAST(SUM(CAST(('0x' || substr(md5(concat_ws('|',
        |    CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR), o_orderstatus)), 1, 15)) AS BIGINT))
        |    % 1152921504606846976 AS BIGINT) AS sample_checksum
        |FROM orders
        |WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 16 = 0""".stripMargin,

    "q_session_window" -> SessionOracleSql,

    "q_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(FLOOR(o_totalprice*10000 + 0.5) AS BIGINT))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)/10000.0
        |    AS running_total
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_window_range" ->
      """WITH daily AS (
        |  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS epoch_day,
        |    SUM(CAST(FLOOR(o_totalprice*10000 + 0.5) AS BIGINT)) AS rev_fp
        |  FROM orders GROUP BY 1)
        |SELECT epoch_day,
        |  CAST(rev_fp AS DOUBLE)/10000.0 AS day_revenue,
        |  CAST(SUM(rev_fp) OVER (ORDER BY epoch_day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)/10000.0
        |    AS trailing_7d_revenue
        |FROM daily ORDER BY epoch_day""".stripMargin,

    "q_set_ops" ->
      """WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders),
        |b AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 300000)
        |SELECT 'except' AS set_op, COUNT(*) AS n FROM (SELECT k FROM a EXCEPT SELECT k FROM b) t
        |UNION ALL
        |SELECT 'intersect', COUNT(*) FROM (SELECT k FROM a INTERSECT SELECT k FROM b) t
        |UNION ALL
        |SELECT 'union', COUNT(*) FROM (SELECT k FROM a UNION SELECT k FROM b) t
        |ORDER BY set_op""".stripMargin,

    "text_ngram_stats" ->
      """WITH docs AS (
        |  SELECT str_split(lower(text), ' ') AS ws FROM documents),
        |b AS (
        |  SELECT unnest(list_transform(range(1, len(ws)),
        |    i -> ws[i] || ' ' || ws[i+1])) AS bigram
        |  FROM docs WHERE len(ws) >= 2)
        |SELECT bigram, COUNT(*) AS n FROM b
        |GROUP BY 1 ORDER BY n DESC, bigram LIMIT 50""".stripMargin,

    "q_range_join_binned" ->
      """WITH w AS (
        |  SELECT event_id AS win_id, epoch_us(ts) AS w_start,
        |    epoch_us(ts) + 600000000 AS w_end
        |  FROM events WHERE event_type = 'error'),
        |p AS (
        |  SELECT event_id, epoch_us(ts) AS tus
        |  FROM events WHERE event_type = 'purchase')
        |SELECT win_id, COUNT(*) AS n_in_window
        |FROM w JOIN p ON tus >= w_start AND tus < w_end
        |GROUP BY win_id ORDER BY win_id""".stripMargin,

    "events_anomaly_online" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |win AS (
        |  SELECT event_type, day, n,
        |    COALESCE(SUM(n) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior_total,
        |    COALESCE(COUNT(n) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior_days
        |  FROM cells)
        |SELECT event_type, day, n, CAST(prior_total AS BIGINT) AS prior_total,
        |  prior_days,
        |  (prior_days > 0 AND n * 2 * prior_days > prior_total * 3) AS is_spike
        |FROM win ORDER BY event_type, day""".stripMargin,

    "events_anomaly" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |stats AS (
        |  SELECT event_type AS et, CAST(SUM(n) AS BIGINT) AS total,
        |    COUNT(*) AS active_days
        |  FROM cells GROUP BY 1)
        |SELECT event_type, day, n, active_days, total,
        |  n * 2 * active_days > total * 3 AS is_spike
        |FROM cells JOIN stats ON event_type = et
        |ORDER BY event_type, day""".stripMargin,

    "q_decile_stats" ->
      """WITH sp AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(FLOOR(o_totalprice*10000 + 0.5) AS BIGINT)) AS DOUBLE)/10000.0 AS spend
        |  FROM orders GROUP BY o_custkey),
        |dt AS (
        |  SELECT o_custkey, spend,
        |    CAST(NTILE(10) OVER (ORDER BY spend DESC, o_custkey) AS BIGINT) AS decile
        |  FROM sp)
        |SELECT decile, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(FLOOR(spend*10000 + 0.5) AS BIGINT)) AS DOUBLE)/10000.0 AS decile_spend,
        |  MIN(spend) AS min_spend, MAX(spend) AS max_spend
        |FROM dt GROUP BY decile ORDER BY decile""".stripMargin,

    "events_gap_histogram" ->
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_us(ts) - LAG(epoch_us(ts)) OVER (
        |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
        |  FROM events),
        |b AS (
        |  SELECT user_id,
        |    CAST(CASE WHEN gap_us < 10000000 THEN 0 WHEN gap_us < 60000000 THEN 1
        |         WHEN gap_us < 600000000 THEN 2 WHEN gap_us < 3600000000 THEN 3
        |         ELSE 4 END AS BIGINT) AS bucket_ord,
        |    CASE WHEN gap_us < 10000000 THEN 'lt_10s' WHEN gap_us < 60000000 THEN 's10_60'
        |         WHEN gap_us < 600000000 THEN 'm1_10' WHEN gap_us < 3600000000 THEN 'm10_60'
        |         ELSE 'ge_1h' END AS bucket
        |  FROM g WHERE gap_us IS NOT NULL)
        |SELECT bucket_ord, bucket, COUNT(*) AS n_gaps,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM b GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "events_retention" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
        |  FROM events),
        |nxt AS (SELECT user_id AS uid2, day - INTERVAL 1 DAY AS day FROM ud)
        |SELECT ud.day AS day,
        |  COUNT(DISTINCT ud.user_id) AS active_users,
        |  COUNT(DISTINCT uid2) AS retained_users
        |FROM ud LEFT JOIN nxt ON ud.day = nxt.day AND ud.user_id = nxt.uid2
        |GROUP BY 1 ORDER BY day""".stripMargin,

    "q_correlated_subquery" ->
      """WITH t AS (
        |  SELECT c_custkey, c_mktsegment, c_acctbal,
        |    CAST(SUM(CAST(FLOOR(c_acctbal*10000 + 0.5) AS BIGINT))
        |        OVER (PARTITION BY c_mktsegment) AS DOUBLE)/10000.0
        |      / COUNT(*) OVER (PARTITION BY c_mktsegment) AS seg_avg
        |  FROM customer)
        |SELECT c_custkey, c_mktsegment, c_acctbal, seg_avg FROM t
        |WHERE c_acctbal > seg_avg
        |ORDER BY c_custkey""".stripMargin,

    "q_skew_join_salted" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n_items,
         |  CAST(SUM(CAST(FLOOR((l_extendedprice*(1-l_discount))*10000 + 0.5) AS BIGINT)) AS DOUBLE)/10000.0 AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin,

    "text_filter_pipeline" ->
      """WITH t AS (
        |  SELECT lang, length(text) AS n_chars,
        |    len(str_split(text, ' ')) AS n_words,
        |    len(list_filter(str_split(text, ' '),
        |        w -> w IN ('the', 'a', 'and', 'of', 'to'))) AS n_stop,
        |    len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS n_punct
        |  FROM documents),
        |k AS (
        |  SELECT lang, n_words,
        |    (n_words BETWEEN 20 AND 1000)
        |      AND CAST(n_stop AS DOUBLE)/n_words >= 0.01
        |      AND CAST(n_punct AS DOUBLE)/n_chars <= 0.2 AS keep
        |  FROM t)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN keep THEN n_words ELSE 0 END) AS BIGINT) AS kept_words
        |FROM k GROUP BY lang ORDER BY lang""".stripMargin,

    "events_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus, event_type, value
        |  FROM events),
        |a AS (
        |  SELECT event_type, value,
        |    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
        |               IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY tus, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
        |  FROM e)
        |SELECT COALESCE(channel, 'direct') AS channel, COUNT(*) AS n_purchases,
        |  CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0
        |    AS revenue
        |FROM a WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_markov" ->
      """WITH e AS (
        |  SELECT event_type AS src,
        |    LEAD(event_type, 1) OVER
        |      (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS dst
        |  FROM events),
        |t AS (
        |  SELECT src, dst, COUNT(*) AS n FROM e
        |  WHERE dst IS NOT NULL GROUP BY src, dst)
        |SELECT src, dst, n,
        |  CAST(n * 1000000 // CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT)
        |       AS BIGINT) AS p_ppm
        |FROM t ORDER BY src, dst""".stripMargin,

    "events_ks_drift" ->
      """WITH e AS (
        |  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
        |    user_id % 2 AS g
        |  FROM events),
        |c AS (
        |  SELECT event_type, cents,
        |    CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM e GROUP BY event_type, cents),
        |w AS (
        |  SELECT event_type,
        |    CAST(SUM(ca) OVER (PARTITION BY event_type ORDER BY cents) AS BIGINT) AS cum_a,
        |    CAST(SUM(cb) OVER (PARTITION BY event_type ORDER BY cents) AS BIGINT) AS cum_b,
        |    CAST(SUM(ca) OVER (PARTITION BY event_type) AS BIGINT) AS n_a,
        |    CAST(SUM(cb) OVER (PARTITION BY event_type) AS BIGINT) AS n_b
        |  FROM c)
        |SELECT event_type, MAX(n_a) AS n_a, MAX(n_b) AS n_b,
        |  CAST(MAX(abs(cum_a * n_b - cum_b * n_a)) * 1000000
        |       // (MAX(n_a) * MAX(n_b)) AS BIGINT) AS ks_ppm
        |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin,

    "events_cohort_matrix" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 // 7 AS wk FROM events),
        |c AS (SELECT user_id, MIN(wk) AS cw FROM uw GROUP BY user_id),
        |s AS (SELECT cw, CAST(COUNT(*) AS BIGINT) AS cohort_size FROM c GROUP BY cw),
        |m AS (SELECT cw AS cohort_week, wk - cw AS week_offset,
        |        CAST(COUNT(*) AS BIGINT) AS n_active
        |      FROM uw JOIN c USING (user_id) GROUP BY 1, 2)
        |SELECT cohort_week, week_offset, n_active, cohort_size,
        |  CAST(n_active * 1000000 // cohort_size AS BIGINT) AS retention_ppm
        |FROM m JOIN s ON s.cw = m.cohort_week
        |ORDER BY cohort_week, week_offset""".stripMargin,

    "events_rolling_active" ->
      """WITH daily AS (
        |  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id FROM events),
        |dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM daily GROUP BY day),
        |ex AS (
        |  SELECT day + s.i AS day, user_id
        |  FROM daily, (SELECT unnest(range(0, 7)) AS i) s),
        |win AS (SELECT day, COUNT(DISTINCT user_id) AS active_7d FROM ex GROUP BY day)
        |SELECT dau.day AS day, dau, active_7d
        |FROM dau JOIN win USING (day) ORDER BY day""".stripMargin,

    // q_approx_distinct: rows-only (HLL sketch internals are engine-specific)
    // dedup_cluster: oracle via recursive CTE
  ) ++ Map(
    "dedup_cluster" -> {
      val pairsSql = DedupSuite.oracles("dedup_minhash_lsh")
      s"""WITH RECURSIVE pairs AS ($pairsSql),
         |edges AS (
         |  SELECT doc_a, doc_b FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |reach(node, lbl) AS (
         |  SELECT doc_a, doc_a FROM edges
         |  UNION
         |  SELECT e.doc_a, r.lbl FROM edges e JOIN reach r ON e.doc_b = r.node),
         |comp AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node)
         |SELECT cluster_id, COUNT(*) AS n_members, MIN(node) AS keep_id
         |FROM comp GROUP BY cluster_id
         |ORDER BY cluster_id""".stripMargin
    },

    "events_user_path" ->
      """WITH o AS (
        |  SELECT event_type,
        |    LEAD(event_type, 1) OVER
        |      (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS e2,
        |    LEAD(event_type, 2) OVER
        |      (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS e3
        |  FROM events)
        |SELECT event_type || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n
        |FROM o WHERE e3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin,

    "q_median_by_group" ->
      """WITH c AS (
        |  SELECT o_orderpriority AS prio,
        |    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |r AS (
        |  SELECT prio, cents,
        |    ROW_NUMBER() OVER (PARTITION BY prio ORDER BY cents) AS rn,
        |    COUNT(*) OVER (PARTITION BY prio) AS cnt
        |  FROM c)
        |SELECT prio,
        |  CAST(SUM(cents * (CASE WHEN (cnt + 1) // 2 = (cnt + 2) // 2
        |                         THEN 2 ELSE 1 END)) AS BIGINT) AS median_cents_x2,
        |  MAX(cnt) AS n_orders
        |FROM r
        |WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
        |GROUP BY prio ORDER BY prio""".stripMargin,

    "q_events_sliding" ->
      """WITH e AS (
        |  SELECT epoch_us(ts) AS t, event_type FROM events),
        |ex AS (
        |  SELECT t - (t % 1800000000) - s.i * 1800000000 AS w_start, event_type
        |  FROM e, (SELECT unnest([0, 1]) AS i) s)
        |SELECT w_start, event_type, COUNT(*) AS n
        |FROM ex GROUP BY w_start, event_type
        |ORDER BY w_start, event_type""".stripMargin,

    "q_events_dau_wau" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |dau AS (
        |  SELECT day, day // 7 AS week, COUNT(DISTINCT user_id) AS dau
        |  FROM e GROUP BY day),
        |wau AS (
        |  SELECT day // 7 AS week, COUNT(DISTINCT user_id) AS wau
        |  FROM e GROUP BY 1),
        |w AS (
        |  SELECT week, CAST(SUM(dau) AS BIGINT) AS sum_dau, COUNT(*) AS n_days
        |  FROM dau GROUP BY week)
        |SELECT w.week AS week, n_days, sum_dau, wau,
        |  CAST(sum_dau * 1000000 // (n_days * wau) AS BIGINT) AS stickiness_ppm
        |FROM w JOIN wau ON w.week = wau.week
        |ORDER BY week""".stripMargin,

    "events_windowed_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
        |v AS (SELECT user_id, MIN(tus) AS t_view FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |p AS (SELECT user_id, tus AS t_buy FROM e WHERE event_type = 'purchase'),
        |u AS (
        |  SELECT v.user_id,
        |    MAX(CASE WHEN t_buy BETWEEN t_view AND t_view + 3600000000
        |             THEN 1 ELSE 0 END) AS conv
        |  FROM v LEFT JOIN p ON v.user_id = p.user_id
        |  GROUP BY v.user_id)
        |SELECT COUNT(*) AS n_viewers, CAST(SUM(conv) AS BIGINT) AS n_converted_1h,
        |  CAST(SUM(conv) * 1000000 // COUNT(*) AS BIGINT) AS conv_ppm
        |FROM u""".stripMargin,

    "mm_shard_manifest" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |c AS (
        |  SELECT *, SUM(n_bytes) OVER (PARTITION BY media_type ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM m)
        |SELECT media_type, CAST((cum - n_bytes) // 65536 AS BIGINT) AS shard_id,
        |  COUNT(*) AS n_items, CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_quartiles_by_group" ->
      """WITH c AS (
        |  SELECT o_orderpriority AS prio,
        |    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |r AS (
        |  SELECT prio, cents,
        |    ROW_NUMBER() OVER (PARTITION BY prio ORDER BY cents) AS rn,
        |    COUNT(*) OVER (PARTITION BY prio) AS cnt
        |  FROM c)
        |SELECT prio,
        |  MAX(CASE WHEN rn = (cnt * 1 + 3) // 4 THEN cents END) AS p25_cents,
        |  MAX(CASE WHEN rn = (cnt * 2 + 3) // 4 THEN cents END) AS p50_cents,
        |  MAX(CASE WHEN rn = (cnt * 3 + 3) // 4 THEN cents END) AS p75_cents,
        |  MAX(cnt) AS n_orders
        |FROM r GROUP BY prio ORDER BY prio""".stripMargin,

    "q_corr_by_group" ->
      """WITH b AS (
        |  SELECT l_returnflag AS flag, CAST(FLOOR(l_quantity) AS BIGINT) AS x,
        |    CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
        |  FROM lineitem),
        |g AS (
        |  SELECT flag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
        |  FROM b GROUP BY flag),
        |v AS (
        |  SELECT flag, n,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cxy
        |  FROM g)
        |SELECT flag, n,
        |  CASE WHEN vx > 0 AND vy > 0 THEN
        |    CAST(FLOOR(cxy / sqrt(vx * vy) * 1e6 + 0.5) AS BIGINT)
        |  ELSE NULL END AS corr_e6,
        |  CAST(FLOOR(vx / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) * 100.0 + 0.5)
        |    AS BIGINT) AS var_x_e2
        |FROM v ORDER BY flag""".stripMargin,

    "q_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin
  )
}
