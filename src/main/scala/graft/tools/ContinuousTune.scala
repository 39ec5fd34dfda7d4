package graft.tools

import org.apache.spark.sql.SparkSession

/** Ops diagnostic: run the steady-state continuous-trigger probe
  * (graft.streaming.CdcStream.continuousProbe) against an arbitrary
  * lake with explicit backend / trigger / state-partition / RocksDB
  * knobs — the tuning loop behind the committed @sf1 continuous bench
  * points (a provisioning decision should be made from THIS loop, not
  * by editing Bench and re-running its whole artifact). Env:
  *
  *   SPARK_GRAFT_SF_DIR     lake dir (default /root/repo/data/sf1)
  *   SPARK_GRAFT_CPUS       local cores (default 32)
  *   GRAFT_TUNE_TWIN        probe twin (default cdc_stream_apply)
  *   GRAFT_TUNE_BACKEND     heap | rocksdb (default rocksdb)
  *   GRAFT_TUNE_TRIGGER_MS  trigger period (default 1000)
  *   GRAFT_TUNE_PARTS      state partitions (default 8)
  *   GRAFT_TUNE_ROCKS      extra RocksDB knobs as "k=v,k=v", keys
  *                          relative to spark.sql.streaming.stateStore
  *                          .rocksdb. (e.g. "blockCacheSizeMB=256")
  *   GRAFT_TUNE_CONF       extra session confs as "k=v,k=v", FULL keys
  *                          (e.g. "spark.sql.streaming.stateStore
  *                          .minDeltasForSnapshot=100")
  *
  * Prints one JSON line: the probe stats plus the exact config used.
  */
object ContinuousTune {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/data/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val twin = sys.env.getOrElse("GRAFT_TUNE_TWIN", "cdc_stream_apply")
    val backend = sys.env.getOrElse("GRAFT_TUNE_BACKEND", "rocksdb")
    val triggerMs = sys.env.getOrElse("GRAFT_TUNE_TRIGGER_MS", "1000").toLong
    val parts = sys.env.getOrElse("GRAFT_TUNE_PARTS", "8").toInt
    val rocks = sys.env.getOrElse("GRAFT_TUNE_ROCKS", "").split(',')
      .map(_.trim).filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        s"spark.sql.streaming.stateStore.rocksdb.$k" -> v
      }.toMap
    // FULL-key session confs apply to BOTH backends (a heap run tuning
    // e.g. minDeltasForSnapshot must not be silently ignored); only the
    // rocksdb.-scoped GRAFT_TUNE_ROCKS keys are backend-conditional.
    val extraConf = sys.env.getOrElse("GRAFT_TUNE_CONF", "").split(',')
      .map(_.trim).filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); k -> v
      }.toMap
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (backend == "rocksdb") {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
      rocks.foreach { case (k, v) => spark.conf.set(k, v) }
    }
    extraConf.foreach { case (k, v) => spark.conf.set(k, v) }
    // the snapshot cadence rides the probe's explicit parameter — a
    // session conf can't override the pin (for registered SQLConf keys
    // "was it user-set" is undetectable: getOption returns the default)
    val cadence = extraConf
      .get("spark.sql.streaming.stateStore.minDeltasForSnapshot")
      .flatMap(_.toIntOption).getOrElse(100)
    val c = graft.streaming.CdcStream.continuousProbe(
      spark, dir, twin, triggerMs = triggerMs, stateParts = parts,
      snapshotCadence = cadence)
    def j(s: String) = "\"" + s + "\""
    val conf = (Map("backend" -> backend, "state_parts" -> parts.toString) ++
      (if (backend == "rocksdb") rocks else Map.empty) ++ extraConf)
      .toSeq.sortBy(_._1)
      .map { case (k, v) => j(k) + ":" + j(v) }.mkString("{", ",", "}")
    println(
      s"""{"twin":${j(c.twin)},"trigger_ms":${c.triggerMs},"batches":${c.batches},""" +
      s""""p50_batch_ms":${c.p50Ms},"p95_batch_ms":${c.p95Ms},"max_batch_ms":${c.maxMs},""" +
      s""""input_rps":${math.round(c.inputRps)},"proc_rps":${math.round(c.procRps)},""" +
      s""""rows":${c.rows},"state_rows":${c.stateRows},"conf":$conf,""" +
      s""""batch_series_ms":${c.batchSeriesMs.mkString("[", ",", "]")}}""")
    try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    catch { case e: Throwable => System.err.println(s"[tune] StateStore.stop: $e") }
    spark.stop()
  }
}
