package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times the headline queries at the driver-chosen
  * SF and prints one JSON line. Headline = the throughput-representative
  * subset (scan/agg, joins, windows, checksums, cdc apply, dedup, text,
  * ann); the quadratic-pair verification ops stay correctness-only.
  * Set SPARK_GRAFT_BENCH_ALL=1 to time every registered query.
  *
  * Beyond wall-time (±15% host variance, CLAUDE.md), every timed run
  * also records DETERMINISTIC work metrics — shuffle bytes/records
  * written and spill — via a task-metrics listener. A plan regression
  * (lost pushdown, new exchange, broadcast turned shuffle) moves
  * shuffle bytes exactly and reproducibly, so those are compared
  * against the checked-in per-query budget (bench/shuffle_budget.txt,
  * sf0.1) and reported as `shuffle_regressions` — the noise-free
  * regression gate wall-time can't be.
  */
object Bench {
  private[graft] val Headline = Seq(
    "q1_pricing_summary", "q3_top_orders", "q5_local_supplier",
    "q_window_rank", "q_events_tumbling", "q_events_sessionize",
    "recon_checksum_agg", "recon_rowlevel", "cdc_apply_latest",
    "pii_pipeline", "dedup_exact", "dedup_minhash_lsh",
    "text_quality", "text_fingerprint", "ann_bruteforce",
    "q_asof_join_native", "q_interval_join", "text_contamination",
    "recon_incremental_stateful",
    // round-4 representatives
    "q9_product_profit", "q18_large_orders", "text_pii_scan",
    "layout_zorder", "ann_lsh",
    // round-4 third wave: band-index probe, compaction, dim-exploded
    // centroid agg, double-window median
    "dedup_incremental", "cdc_compact_log", "emb_centroid_drift",
    "q_median_by_group")

  /** Sums task-level shuffle-write and spill metrics across every task
    * the session runs; the timed loop snapshots it around each run.
    * Task metrics are exact counters, not samples — identical plans
    * produce identical byte counts run over run.
    */
  private final class WorkMeter extends SparkListener {
    val bytes = new LongAdder; val records = new LongAdder; val spill = new LongAdder
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      // successful tasks only: a failed-then-retried task would count
      // its shuffle writes twice and fabricate a gate flag
      if (m != null && e.taskInfo != null && e.taskInfo.successful) {
        bytes.add(m.shuffleWriteMetrics.bytesWritten)
        records.add(m.shuffleWriteMetrics.recordsWritten)
        spill.add(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    }
    def snap: (Long, Long, Long) = (bytes.sum, records.sum, spill.sum)
  }

  private case class Work(bytes: Long, records: Long, spill: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      // (note: each lake table is a single one-row-group parquet file,
      // so scan parallelism is fixed at 1 task regardless of
      // maxPartitionBytes; post-scan stages parallelize across cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new WorkMeter
    spark.sparkContext.addSparkListener(meter)

    val names = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(list) => list.split(',').map(_.trim).filter(SparkEntry.queries.contains).toSeq
      case None if sys.env.contains("SPARK_GRAFT_BENCH_ALL") => SparkEntry.queries.keys.toSeq.sorted
      case None => Headline.filter(SparkEntry.queries.contains)
    }

    // Materialize through the noop sink: count() lets Catalyst prune the
    // projected columns, so narrow ops (pii masks, text scoring) would be
    // optimized down to a bare scan; the noop write evaluates every
    // output column without paying filesystem cost.
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Warm the JVM/codegen/IO paths once so timings reflect steady state,
    // not first-query session setup.
    spark.range(1000000).selectExpr("sum(id)").collect()
    // warmup failure is not fatal: the timed loop below records the
    // per-query error so the JSON still reports what broke
    try materialize(SparkEntry.queries("q1_pricing_summary")(spark, sfDir))
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }

    /** Snapshot the meter with the listener bus drained, so every
      * completed task's metrics are already folded in.
      */
    def snapDrained(): (Long, Long, Long) = {
      org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      meter.snap
    }

    // One untimed warm run (pays per-query whole-stage-codegen
    // compilation — a JVM artifact, not engine throughput) + `timedRuns`
    // timed runs per query, report the MEDIAN: the r4 bench showed a
    // uniform ~1.16× drift on untouched queries from GC pressure
    // accumulating across a 28-query single-process session; a forced GC
    // before every timed run plus the median makes timings insensitive
    // to both collection pauses landing inside one run and one-off
    // JIT/IO blips. A query that throws is reported under "errors"
    // (never as a timing): a partial elapsed-to-exception time would
    // make a broken query look fast and the regression invisible.
    // Work metrics come from the LAST timed run (they are deterministic
    // — any run would do).
    def timeSet(qnames: Seq[String], dir: String, timedRuns: Int = 3)
        : Seq[(String, Either[String, (Double, Work)])] =
      qnames.map { name =>
        var work = Work(0L, 0L, 0L)
        val runs = (0 to timedRuns).map { i =>
          // each run starts cache-cold: leftover persists from the previous
          // run would otherwise make later runs time a cache read, and the
          // accumulated entries would spill the long bench session
          spark.catalog.clearCache()
          // drain garbage from the previous query/run so its collection
          // cost isn't billed to this timing
          System.gc()
          val before = snapDrained()
          val t0 = System.nanoTime()
          val err =
            try { materialize(SparkEntry.queries(name)(spark, dir)); None }
            catch { case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: $e")
              Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
            }
          val dt = (System.nanoTime() - t0) / 1e9
          if (err.isEmpty && i == timedRuns) {
            val after = snapDrained()
            work = Work(after._1 - before._1, after._2 - before._2, after._3 - before._3)
          }
          (dt, err, i)
        }
        runs.collectFirst { case (_, Some(msg), _) => name -> Left(msg) }
          .getOrElse {
            val timed = runs.collect { case (t, None, i) if i > 0 => t }.sorted
            name -> Right((timed(timed.length / 2), work))
          }
      }
    val results = timeSet(names, sfDir)

    // Scale-curve pass: re-time the same set at a 10× smaller SF and
    // report the per-query growth ratio — a super-linear operator (10×
    // data → >20× time) passes a single-SF bench unnoticed until it is
    // 100× bigger, so the curve IS the scale evidence. Skipped when the
    // sibling SF directory is absent or when benching a custom dir.
    val scaleDir = sys.env.get("SPARK_GRAFT_SCALE_DIR")
      .orElse(if (sfDir.endsWith("sf0.1")) Some(sfDir.dropRight(5) + "sf0.01") else None)
      .filter(d => d != sfDir && new java.io.File(d).isDirectory)
    val scaleResults = scaleDir.map(d => timeSet(names, d)).getOrElse(Seq.empty)

    // Upper scale point: a deterministic 10× tile-up of sf0.1 (~170 MB —
    // past trivial cache effects, see graft.tools.TileUp), timed with a
    // single timed run (growth-ratio threshold is 20×; sub-noise
    // precision isn't needed at 10× the wall-cost per run). Generated on
    // first use, reused after. SPARK_GRAFT_SF1=0 disables.
    val sf1Dir = sys.env.get("SPARK_GRAFT_SF1_DIR")
      .orElse(if (sfDir.endsWith("sf0.1")) Some("/root/repo/data/sf1") else None)
      .filter(_ => sys.env.getOrElse("SPARK_GRAFT_SF1", "1") != "0")
      .filter(d => graft.tools.TileUp.ensure(spark, sfDir, d))
    val sf1Results = sf1Dir.map(d => timeSet(names, d, timedRuns = 1)).getOrElse(Seq.empty)

    // Streaming throughput: run the two state-heaviest twins once per
    // STATE BACKEND (heap-backed default vs RocksDB + changelog
    // checkpointing) at the bench SF and surface their micro-batch
    // progress (rows/sec over trigger time, batch count, final state
    // rows) — head-to-head evidence for the backend a production
    // deployment runs. Evidence numbers, not regression-gated —
    // state-store throughput rides the same host variance as
    // everything else.
    val streamingNames =
      if (sys.env.getOrElse("SPARK_GRAFT_BENCH_STREAMING", "1") == "0") Seq.empty
      else Seq("cdc_stream_apply", "stream_dedup_minhash")
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val backends = Seq(
      "" -> Map.empty[String, String],
      "@rocksdb" -> Map(
        providerKey ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true"))
    val streaming = backends.flatMap { case (suffix, confs) =>
      val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val out = streamingNames.flatMap { name =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        val ok =
          try { materialize(graft.streaming.CdcStream.queries(name)(spark, sfDir)); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] streaming $name$suffix FAILED: $e"); false
          }
        val wall = (System.nanoTime() - t0) / 1e9
        if (!ok) None
        else graft.streaming.CdcStream.progressLog.get(name).map { prog =>
          val rows = prog.map(_._1).sum
          val trigMs = prog.map(_._2).sum
          val rps = if (trigMs > 0) rows.toDouble * 1000.0 / trigMs else 0.0
          (name + suffix, wall, rows, prog.size, rps, prog.map(_._3).lastOption.getOrElse(0L))
        }
      }
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      out
    }

    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\n\\r\\t]", " ") + "\""
    def jnum(v: Double) = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val ok = results.collect { case (k, Right((v, _))) => k -> v }
    val workOk = results.collect { case (k, Right((_, w))) => k -> w }
    val errs = results.collect { case (k, Left(m)) => k -> m } ++
      scaleResults.collect { case (k, Left(m)) => (k + "@scale") -> m } ++
      sf1Results.collect { case (k, Left(m)) => (k + "@sf1") -> m }
    val qs = ok.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val es = errs.map { case (k, m) => jstr(k) + ":" + jstr(m) }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum

    def ratioMap(base: Seq[(String, Double)], bigger: Map[String, Double]) =
      base.flatMap { case (k, v) => bigger.get(k).filter(_ => v > 0).map(s => k -> s / v) }
    val scaleOk = scaleResults.collect { case (k, Right((v, _))) => k -> v }.toMap
    val ratios = ok.flatMap { case (k, v) =>
      scaleOk.get(k).filter(_ > 0).map(s => k -> v / s)
    }
    val sf1Ok = sf1Results.collect { case (k, Right((v, _))) => k -> v }.toMap
    val ratiosSf1 = ratioMap(ok, sf1Ok)
    // Shuffle-VOLUME growth across a 10× hop is deterministic where
    // wall-time is noisy: a linear operator moves ~10× the bytes for
    // 10× the data. The FLAGGED comparison is sf0.01→sf0.1 — both
    // single-file lakes, so pre-shuffle map parallelism is equal and
    // the ratio isolates the plan. (The sf1 hop is reported
    // informationally below but NOT flagged: sf1 is an 8-file lake, so
    // high-cardinality partial aggregates legitimately emit up to
    // 8 map tasks' worth of per-group partials — a layout effect, not
    // a plan regression; at real multi-file scale partials are bounded
    // by groups-per-task on BOTH sides of any hop.) Bases under 64 KB
    // are skipped — ratios on KB-sized shuffles measure framing
    // constants, not the plan.
    val sf1Work = sf1Results.collect { case (k, Right((_, w))) => k -> w }.toMap
    val scaleWork = scaleResults.collect { case (k, Right((_, w))) => k -> w }.toMap
    val workMap = workOk.toMap
    val shuffleGrowth = scaleWork.toSeq.flatMap { case (k, small) =>
      workMap.get(k).filter(_ => small.bytes > 64 * 1024)
        .map(big => k -> big.bytes.toDouble / small.bytes)
    }
    val shuffleGrowthSf1 = workOk.flatMap { case (k, w) =>
      sf1Work.get(k).filter(_ => w.bytes > 64 * 1024).map(s => k -> s.bytes.toDouble / w.bytes)
    }
    val superlinear = ratios.collect { case (k, r) if r > 20.0 => k } ++
      ratiosSf1.collect { case (k, r) if r > 20.0 => k + "@sf1" } ++
      shuffleGrowth.collect { case (k, r) if r > 15.0 => k + "@shuffle" }
    val scaleJson = if (scaleResults.isEmpty) "" else {
      val sq = scaleOk.toSeq.sortBy(_._1)
        .map { case (k, v) => jstr(k) + ":" + jnum(v) }.mkString("{", ",", "}")
      val rq = ratios.map { case (k, r) => jstr(k) + ":" + jnum(r) }.mkString("{", ",", "}")
      val sg = shuffleGrowth.sortBy(_._1)
        .map { case (k, r) => jstr(k) + ":" + jnum(r) }.mkString("{", ",", "}")
      s""","scale_sf":${jstr(scaleDir.get)},"scale_queries":$sq,"growth_ratio":$rq,"shuffle_growth":$sg"""
    }
    val sf1Json = if (sf1Results.isEmpty) "" else {
      val sq = sf1Ok.toSeq.sortBy(_._1)
        .map { case (k, v) => jstr(k) + ":" + jnum(v) }.mkString("{", ",", "}")
      val rq = ratiosSf1.map { case (k, r) => jstr(k) + ":" + jnum(r) }.mkString("{", ",", "}")
      val sg = shuffleGrowthSf1.toSeq.sortBy(_._1)
        .map { case (k, r) => jstr(k) + ":" + jnum(r) }.mkString("{", ",", "}")
      val spill1 = sf1Work.filter(_._2.spill > 0).toSeq.sortBy(_._1)
        .map { case (k, w) => jstr(k) + ":" + w.spill }.mkString("{", ",", "}")
      s""","sf1_dir":${jstr(sf1Dir.get)},"sf1_queries":$sq,"growth_ratio_sf1":$rq,"shuffle_growth_sf1_info":$sg,"sf1_spill_bytes":$spill1"""
    }
    val slJson = s""","superlinear":${superlinear.map(jstr).mkString("[", ",", "]")}"""

    // Deterministic regression gate: compare sf0.1 shuffle bytes against
    // the committed budget; >10% growth = a plan changed shape. (New
    // queries without a budget line are reported, not flagged.) Only
    // armed at the budget's recorded config — shuffle bytes move with
    // partition count (framing + AQE coalescing), so a different
    // SPARK_GRAFT_CPUS must not fabricate regressions.
    val budgetPath = "/root/repo/bench/shuffle_budget.txt"
    val budget: Map[String, Long] =
      if (!sfDir.endsWith("sf0.1") || cpus != "32" ||
        !new java.io.File(budgetPath).isFile) Map.empty
      else scala.io.Source.fromFile(budgetPath, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .flatMap { l => l.split("\\s+") match {
          case Array(k, v) => v.toLongOption.map(k -> _)
          case _ => None
        }}.toMap
    val shuffleRegressions = workOk.collect {
      case (k, w) if budget.get(k).exists(b => w.bytes > b * 1.10 + 1024) =>
        s"$k:${budget(k)}->${w.bytes}"
    }
    val workJson = {
      val sb = workOk.map { case (k, w) => jstr(k) + ":" + w.bytes }.mkString("{", ",", "}")
      val sr = workOk.map { case (k, w) => jstr(k) + ":" + w.records }.mkString("{", ",", "}")
      val sp = workOk.filter(_._2.spill > 0)
        .map { case (k, w) => jstr(k) + ":" + w.spill }.mkString("{", ",", "}")
      val flags = shuffleRegressions.map(jstr).mkString("[", ",", "]")
      s""","shuffle_bytes":$sb,"shuffle_records":$sr,"spill_bytes":$sp,"shuffle_regressions":$flags"""
    }
    val streamJson = if (streaming.isEmpty) "" else {
      val entries = streaming.map { case (name, wall, rows, batches, rps, stateRows) =>
        jstr(name) + s""":{"wall_sec":${jnum(wall)},"input_rows":$rows,"batches":$batches,"rows_per_sec":${jnum(rps)},"state_rows":$stateRows}"""
      }.mkString("{", ",", "}")
      s""","streaming":$entries"""
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":"$sfDir"$scaleJson$sf1Json$slJson$workJson$streamJson}""")
    spark.stop()
    if (errs.nonEmpty) sys.exit(1)
  }
}
