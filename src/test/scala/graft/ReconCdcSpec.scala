package graft

import graft.operators.{CdcSuite, ReconSuite}
import graft.streaming.CdcStream

class ReconCdcSpec extends SparkSpecBase {

  test("rowcount compare reports the engineered drift") {
    val r = ReconSuite.queries("recon_rowcount")(spark, sf).collect().head
    assert(r.getAs[String]("status") == "MISMATCH")
    // target drops %97 keys and adds %101 copies — never equal for our data
    assert(r.getAs[Long]("difference") != 0)
  }

  test("aggregate checksum flags the mismatch; chunked localizes it") {
    val agg = ReconSuite.queries("recon_checksum_agg")(spark, sf).collect().head
    assert(agg.getAs[String]("status") == "MISMATCH")
    val chunks = ReconSuite.queries("recon_checksum_chunked")(spark, sf).collect()
    assert(chunks.length == 32)
    assert(chunks.exists(_.getAs[String]("status") == "MISMATCH"))
    assert(chunks.exists(_.getAs[String]("status") == "MATCH"),
      "perturbation touches some chunks, not all — chunking must localize")
  }

  test("row-level diff classifies all three discrepancy kinds consistently with the moduli") {
    val rows = ReconSuite.queries("recon_rowlevel")(spark, sf).collect()
    val byType = rows.groupBy(_.getAs[String]("discrepancy_type")).view.mapValues(_.length).toMap
    assert(byType.keySet == Set("MISSING", "EXTRA", "MODIFIED"))
    rows.foreach { r =>
      val k = r.getAs[Long]("o_orderkey")
      r.getAs[String]("discrepancy_type") match {
        case "MISSING"  => assert(k % 97 == 0)
        case "EXTRA"    => assert(k >= 100000000L && (k - 100000000L) % 101 == 0)
        case "MODIFIED" => assert(k % 89 == 0)
      }
    }
  }

  test("repair SQL covers every discrepancy with the right verb") {
    val rows = ReconSuite.queries("recon_repair")(spark, sf).collect()
    rows.foreach { r =>
      val sql = r.getAs[String]("repair_sql")
      val k = r.getAs[Long]("o_orderkey")
      if (k < 100000000L && k % 97 == 0) assert(sql.startsWith("INSERT"))
      else if (k >= 100000000L) assert(sql.startsWith("DELETE"))
      else assert(sql.startsWith("UPDATE"))
    }
  }

  test("multi-table recon: only orders drifts") {
    val rows = ReconSuite.queries("recon_multi_table")(spark, sf).collect()
    rows.foreach { r =>
      val expected = if (r.getAs[String]("table_name") == "orders") "MISMATCH" else "MATCH"
      assert(r.getAs[String]("status") == expected)
    }
  }

  test("cdc apply: deletes gone, updates applied, inserts kept") {
    val state = CdcSuite.queries("cdc_apply_latest")(spark, sf).collect()
    assert(state.nonEmpty)
    state.foreach { r =>
      val id = r.getAs[Long]("id")
      assert(id % 13 != 0, "deleted keys must not survive")
      if (id % 7 == 0) assert(r.getAs[String]("status") == "U")
      else assert(r.getAs[String]("status") != "U")
    }
  }

  test("streaming apply equals batch apply exactly") {
    val batch = CdcSuite.queries("cdc_apply_latest")(spark, sf).collect().map(_.toSeq)
    val stream = CdcStream.queries("cdc_stream_apply")(spark, sf).collect().map(_.toSeq)
    assert(stream.sameElements(batch))
  }

  test("stateful incremental recon: state persists, delta-only scan, combined checksum equals full") {
    import org.apache.spark.sql.functions._
    val out = ReconSuite.queries("recon_incremental_stateful")(spark, sf).collect().head
    // state landed on disk and carries the watermark
    val state = spark.read.parquet(ReconSuite.stateDirFor(sf)).collect().head
    val wm = state.getAs[java.time.LocalDateTime]("watermark")
    assert(wm != null)
    // the incremental phase scanned ONLY the delta
    val deltaExpected = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_orderdate") > lit(wm)).count()
    assert(out.getAs[Long]("delta_rows") == deltaExpected)
    val total = graft.sources.Tables.orders(spark, sf).count()
    assert(out.getAs[Long]("total_rows") == total)
    assert(deltaExpected < total, "watermark must split the table, else nothing is incremental")
    // combined (stored prefix + delta) checksum == one-shot full checksum
    val full = ReconSuite.queries("recon_checksum_agg")(spark, sf).collect().head
    assert(out.getAs[Long]("source_checksum") == full.getAs[Long]("source_checksum"))
    assert(out.getAs[String]("status") == "MISMATCH", "target is perturbed")
    // the delta predicate (a literal timestamp) reaches the parquet scan
    val deltaFrame = graft.sources.Tables.orders(spark, sf).filter(col("o_orderdate") > lit(wm))
    deltaFrame.collect()
    val plan = deltaFrame.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(o_orderdate"),
      s"watermark filter must push down to the scan:\n$plan")
    // a second scheduled run re-reads the persisted state and reproduces
    // the identical result (deterministic watermark, idempotent state
    // overwrite)
    val again = ReconSuite.queries("recon_incremental_stateful")(spark, sf).collect().head
    assert(again.toSeq == out.toSeq)
  }

  test("before-image envelope: inserts lack before, deletes lack after, updates carry both") {
    val rows = CdcSuite.queries("cdc_before_image")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      r.getAs[String]("op") match {
        case "c" =>
          assert(r.isNullAt(r.fieldIndex("before_status")))
          assert(!r.isNullAt(r.fieldIndex("after_status")))
        case "u" =>
          assert(!r.isNullAt(r.fieldIndex("before_status")))
          assert(r.getAs[String]("after_status") == "U")
        case "d" =>
          assert(!r.isNullAt(r.fieldIndex("before_status")))
          assert(r.isNullAt(r.fieldIndex("after_status")))
          // a delete of an updated key carries the post-update image
          if (r.getAs[Long]("id") % 7 == 0)
            assert(r.getAs[String]("before_status") == "U")
      }
    }
  }

  test("update diff: every update changed exactly the status column") {
    val rows = CdcSuite.queries("cdc_update_diff")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("id") % 7 == 0)
      // fixture updates rewrite status only; custkey is carried unchanged
      assert(r.getAs[String]("changed_columns") == "status")
    }
  }

  test("repair dialects: postgres quotes with \", sqlserver with brackets; escape path exercised") {
    val pg = ReconSuite.queries("recon_repair")(spark, sf).collect()
    val ms = ReconSuite.queries("recon_repair_sqlserver")(spark, sf).collect()
    assert(pg.length == ms.length && pg.nonEmpty)
    assert(pg.forall(_.getAs[String]("repair_sql").contains("\"orders\"")))
    assert(ms.forall(_.getAs[String]("repair_sql").contains("[orders]")))
    // fixture source carries a literal quote on MISSING keys → INSERTs must ''-escape it
    val inserts = pg.map(_.getAs[String]("repair_sql")).filter(_.startsWith("INSERT"))
    assert(inserts.nonEmpty && inserts.forall(_.contains("''Q")))
    // aside from quoting style, the statements are identical
    pg.zip(ms).foreach { case (a, b) =>
      assert(a.getAs[String]("repair_sql").replace("\"", "") ==
        b.getAs[String]("repair_sql").replace("[", "").replace("]", ""))
    }
  }

  test("report export roundtrip: both formats lossless") {
    val rows = ReconSuite.queries("recon_report_export")(spark, sf).collect()
    assert(rows.map(_.getAs[String]("format")).toSet == Set("csv", "json"))
    rows.foreach { r =>
      assert(r.getAs[String]("status") == "OK")
      assert(r.getAs[Long]("n_rows") > 0)
    }
  }

  test("metadata rowcount: exact, and reads no data pages") {
    val df = ReconSuite.queries("recon_rowcount_fast")(spark, sf)
    val r = df.collect().head
    val actual = graft.sources.Tables.orders(spark, sf).count()
    assert(r.getAs[Long]("row_count") == actual)
    assert(r.getAs[String]("method") == "METADATA")
    // the plan must not contain a parquet FileScan — counts come from footers
    assert(!df.queryExecution.executedPlan.toString.contains("FileScan parquet"),
      "fast rowcount must not scan data")
  }

  test("streaming attribution equals the batch last-touch rollup exactly") {
    val batch = graft.operators.ExtendedSuite.queries("events_attribution")(spark, sf)
      .collect().map(_.toSeq)
    val stream = CdcStream.queries("stream_attribution")(spark, sf).collect().map(_.toSeq)
    assert(stream.nonEmpty && stream.sameElements(batch))
  }

  test("streaming sessionize equals the batch session_window rollup exactly") {
    val batch = graft.operators.ExtendedSuite.queries("q_session_window")(spark, sf)
      .collect().map(_.toSeq)
    val stream = CdcStream.queries("stream_sessionize")(spark, sf).collect().map(_.toSeq)
    assert(stream.nonEmpty && stream.sameElements(batch))
  }

  test("session-interval merge is order-independent and matches brute force") {
    // the bounded-state kernel behind stream_sessionize: folding events
    // in ANY order yields the same merged intervals, and (n_events,
    // n_sessions) equals the sorted-timestamps gap count
    val gap = CdcStream.SessionGapUs
    val rnd = new scala.util.Random(42)
    (1 to 50).foreach { _ =>
      val n = 1 + rnd.nextInt(40)
      // timestamps clustered so bridging/extension/exact-gap all occur
      val ts = Seq.fill(n)(rnd.nextInt(20).toLong * (gap / 2) + rnd.nextInt(3))
      val sorted = ts.sorted
      val expectSessions = 1 + sorted.zip(sorted.tail).count { case (a, b) => b - a >= gap }
      Seq(ts, ts.reverse, rnd.shuffle(ts)).foreach { perm =>
        val ivs = perm.foldLeft(Vector.empty[(Long, Long, Long)]) {
          (acc, t) => CdcStream.mergeSessionInterval(acc, t, gap)
        }
        assert(ivs.map(_._3).sum == n.toLong, s"event count lost for $perm")
        assert(ivs.size == expectSessions, s"sessions ${ivs.size} != $expectSessions for $perm")
        // invariant: disjoint, sorted, separated by >= gap
        ivs.zip(ivs.tail).foreach { case ((_, e1, _), (s2, _, _)) =>
          assert(s2 - e1 >= gap)
        }
      }
    }
  }

  test("schema drift report classifies the engineered drift") {
    val rows = ReconSuite.queries("recon_schema_drift")(spark, sf).collect()
      .map(r => r.getAs[String]("column_name") -> r.getAs[String]("status")).toMap
    assert(rows("o_orderkey") == "MATCH")
    assert(rows("o_totalprice") == "TYPE_CHANGED")
    assert(rows("o_orderpriority") == "MISSING_IN_TARGET")
    assert(rows("o_region") == "EXTRA_IN_TARGET")
  }

  test("stream-stream interval join equals the batch inner formulation") {
    import org.apache.spark.sql.functions._
    val stream = CdcStream.queries("stream_interval_join")(spark, sf).collect().map(_.toSeq)
    val batch = graft.operators.ExtendedSuite.queries("q_interval_join")(spark, sf)
      .filter(col("n_views_30m") > 0).collect().map(_.toSeq)
    assert(stream.nonEmpty && stream.sameElements(batch))
  }

  test("streaming windowed counts equal the batch group-by") {
    val stream = CdcStream.queries("stream_windowed_agg")(spark, sf).collect()
      .map(r => (r.get(0).toString, r.getAs[String]("event_type")) -> r.getAs[Long]("n")).toMap
    val batch = graft.sources.Tables.events(spark, sf)
      .groupBy(org.apache.spark.sql.functions.date_trunc("hour",
        org.apache.spark.sql.functions.col("ts")).as("w"),
        org.apache.spark.sql.functions.col("event_type"))
      .count().collect()
      .map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(stream == batch)
  }

  test("bootstrap merge equals full-log replay; asof state precedes the deletes") {
    import graft.operators.CdcSuite
    val replay = CdcSuite.queries("cdc_apply_latest")(spark, sf).collect().map(_.toSeq)
    val boot = CdcSuite.queries("cdc_bootstrap_merge")(spark, sf).collect().map(_.toSeq)
    assert(boot.sameElements(replay),
      "snapshot + tail must converge to the same state as full replay")
    val asof = CdcSuite.queries("cdc_asof_state")(spark, sf).collect()
    assert(asof.length > replay.length, "pre-delete horizon keeps the deleted keys")
    asof.filter(_.getLong(0) % 7 == 0).foreach { r =>
      assert(r.getString(2) == "U", "seq-2 updates are inside the horizon")
    }
  }

  test("recon_profile localizes drift per column with exact counts") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.ReconSuite.queries("recon_profile")(spark, sf).collect()
    assert(rows.length == 4)
    val n = graft.sources.Tables.orders(spark, sf).count()
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("src_n")) == n, "source side counts every row")
      // the drift fixture drops %97 keys and adds %101 clones, so every
      // column's target count differs from source — all mismatch
      assert(r.getString(r.fieldIndex("status")) == "MISMATCH")
      assert(r.getLong(r.fieldIndex("tgt_n")) != n)
    }
  }

  test("streaming checksum state equals the batch chunked checksum") {
    import org.apache.spark.sql.functions._
    val stream = graft.streaming.CdcStream.queries("stream_recon_checksum")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = graft.sources.Tables.orders(spark, sf)
      .groupBy((col("o_orderkey") % 32).as("chunk"))
      .agg(graft.functions.Portable.checksumAgg(graft.functions.Portable.rowStr(
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_orderpriority"))).as("ck"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stream == batch, "incremental state must equal the one-shot checksum")
  }

  test("merkle checksum tree propagates mismatches upward consistently") {
    val rows = graft.operators.ReconSuite.queries("recon_checksum_merkle")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(rows.count(_._1._1 == 0L) == 32 && rows.count(_._1._1 == 1L) == 4 &&
      rows.count(_._1._1 == 2L) == 1, "tree shape must be 32/4/1")
    // a parent mismatches iff at least one child mismatches (the
    // order-insensitive hash-sum makes upward propagation exact)
    def children(level: Long, node: Long): Seq[String] = {
      val fanIn = if (level == 1L) 8L else 4L
      rows.collect { case ((l, n), st) if l == level - 1 && n / fanIn == node => st }.toSeq
    }
    for (level <- Seq(1L, 2L); node <- rows.keys.filter(_._1 == level).map(_._2)) {
      val anyChildMismatch = children(level, node).contains("MISMATCH")
      assert((rows((level, node)) == "MISMATCH") == anyChildMismatch,
        s"level $level node $node inconsistent with its children")
    }
  }

  test("columnwise checksum localizes drift to exactly the mutated column") {
    val rows = graft.operators.ReconSuite.queries("recon_checksum_columnwise")(spark, sf)
      .collect().map(r => r.getAs[String]("column_name") -> r.getAs[String]("status")).toMap
    assert(rows == Map("o_custkey" -> "MATCH", "o_orderpriority" -> "MATCH",
      "o_orderstatus" -> "MISMATCH"))
  }

  test("recon_bisect narrows every fixture discrepancy into a MISMATCH key range") {
    val rows = graft.operators.ReconSuite.queries("recon_bisect")(spark, sf).collect()
    assert(rows.nonEmpty)
    val keys = graft.sources.Tables.orders(spark, sf)
      .select("o_orderkey").collect().map(_.getLong(0))
    val (lo, w) = (keys.min, keys.max - keys.min + 1)
    def cell(k: Long, n: Long): Long = math.min(math.max((k - lo) * n / w, 0L), n - 1L)

    // range bounds invert the bucket function exactly
    rows.foreach { r =>
      val (c, lk, hk) = (r.getAs[Long]("cell"), r.getAs[Long]("lo_key"), r.getAs[Long]("hi_key"))
      assert(lk <= hk, s"cell $c: empty range")
      assert(cell(lk, 256) == c && cell(hk, 256) == c, s"cell $c bounds don't invert")
    }
    // only children of mismatched parents are emitted, 8 per parent
    val byParent = rows.groupBy(_.getAs[Long]("cell") / 8)
    byParent.foreach { case (p, rs) =>
      assert(rs.length == 8, s"parent $p: expected all 8 children, got ${rs.length}")
      assert(rs.exists(_.getAs[String]("status") == "MISMATCH"),
        s"parent $p emitted but no child mismatches")
    }
    // every fixture discrepancy key lands in a MISMATCH range; every
    // MATCH range's source count equals the actual key count in range
    val status = rows.map(r => r.getAs[Long]("cell") -> r.getAs[String]("status")).toMap
    val discrepant =
      keys.filter(_ % 97 == 0) ++                            // MISSING
        keys.filter(k => k % 89 == 0 && k % 97 != 0) ++      // MODIFIED
        keys.filter(_ % 101 == 0).map(_ + 100000000L)        // EXTRA (clamped)
    discrepant.foreach { k =>
      assert(status.get(cell(k, 256)).contains("MISMATCH"),
        s"discrepant key $k not inside a MISMATCH range")
    }
    rows.filter(_.getAs[String]("status") == "MATCH").foreach { r =>
      val n = keys.count(k => k >= r.getAs[Long]("lo_key") && k <= r.getAs[Long]("hi_key"))
      assert(r.getAs[Long]("src_rows") == n, s"cell ${r.getAs[Long]("cell")}: src_rows")
    }
  }

  test("recon_bisect pass 2 reads only flagged slices, range pushed to the scan") {
    import org.apache.spark.sql.functions._
    val o = graft.sources.Tables.orders(spark, sf)
    val keys = o.select("o_orderkey").collect().map(_.getLong(0))
    val (lo, w) = (keys.min, keys.max - keys.min + 1)
    // corrupt only the first quarter of coarse slice 10, so exactly one
    // parent is flagged and its later children stay clean
    val sliceLo = lo + (10 * w + 31) / 32
    val sliceHi = lo + (11 * w + 31) / 32 - 1
    val tgt = o.withColumn("o_orderstatus",
      when(col("o_orderkey").between(sliceLo, sliceLo + (sliceHi - sliceLo) / 4), lit("Z"))
        .otherwise(col("o_orderstatus")))
    val df = ReconSuite.bisectDrill(spark, o, tgt)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("cell") / 8 == 10),
      "pass 2 emitted cells outside the flagged slice")
    assert(rows.exists(_.getAs[String]("status") == "MISMATCH"))
    assert(rows.exists(_.getAs[String]("status") == "MATCH"))
    // the drill-down predicate must reach the parquet scan itself —
    // pass 2 reads only the flagged slice's row groups, not the table
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(o_orderkey") &&
      plan.contains("LessThanOrEqual(o_orderkey"), plan)
  }
}
