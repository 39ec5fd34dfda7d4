package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.sources.Tables
import graft.streaming.CdcStream

/** Every streaming twin, re-run on the RocksDB state store provider
  * with changelog checkpointing, against its batch twin's result. The
  * twins' correctness proofs elsewhere all ran on the heap-backed
  * default provider; a production deployment of the reference's
  * unbounded CDC contract would run RocksDB (per-key state off-heap,
  * delta checkpoints), and the two providers serialize state through
  * different paths — this suite is the evidence the semantics don't
  * depend on the backend. Batch-vs-stream equality transfers the batch
  * side's DuckDB-oracle green to the RocksDB run.
  */
class RocksDbTwinsSpec extends SparkSpecBase with WithSessionConfs {
  def sessionConfs: Map[String, String] = RocksDbConfs.confs

  /** Align the stream result to the batch column order, then compare as
    * row sets (sorted) — twins share their batch twin's ORDER BY, but
    * tie groups (e.g. scd2 versions sharing ts_ms) may interleave
    * differently between runs.
    */
  private def assertTwin(streamDf: DataFrame, batchDf: DataFrame): Unit = {
    val aligned = streamDf.select(batchDf.columns.map(col).toSeq: _*)
    def rows(df: DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(rows(aligned) === rows(batchDf))
  }

  /** Twins whose batch twin is itself a registered (oracle-checked)
    * query — equality here chains the RocksDB run to the DuckDB oracle.
    */
  private val batchTwin = Seq(
    "cdc_stream_apply" -> "cdc_apply_latest",
    "stream_source_envelope" -> "cdc_apply_latest",
    "stream_scd2" -> "cdc_scd2_build",
    "stream_compact_log" -> "cdc_compact_log",
    "stream_dedup_exact" -> "dedup_exact",
    "stream_dedup_minhash" -> "dedup_minhash_lsh",
    "stream_sessionize" -> "q_session_window",
    "stream_mix_monitor" -> "mix_weights",
    "stream_attribution" -> "events_attribution")

  batchTwin.foreach { case (streamName, batchName) =>
    test(s"$streamName on RocksDB equals batch $batchName") {
      assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        .contains("RocksDB"))
      assertTwin(
        CdcStream.queries(streamName)(spark, sf),
        SparkEntry.queries(batchName)(spark, sf))
    }
  }

  // The three twins whose batch formulation is inline SQL in
  // CdcStream.oracles get the same formulation as a DataFrame here.

  test("stream_windowed_agg on RocksDB equals batch hourly counts") {
    val batch = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("win_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("win_start", "event_type")
    assertTwin(CdcStream.queries("stream_windowed_agg")(spark, sf), batch)
  }

  test("stream_recon_checksum on RocksDB equals batch chunked checksum") {
    val batch = Tables.orders(spark, sf)
      .select((col("o_orderkey") % 32).as("chunk"),
        Portable.rowStr(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_orderpriority")).as("r"))
      .groupBy("chunk")
      .agg(Portable.checksumAgg(col("r")).as("source_checksum"),
        count(lit(1)).as("source_rows"))
      .orderBy("chunk")
    assertTwin(CdcStream.queries("stream_recon_checksum")(spark, sf), batch)
  }

  test("stream_interval_join on RocksDB equals batch interval join") {
    val ev = Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("ptus"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("vuser"), unix_micros(col("ts")).as("vtus"))
    val batch = p.join(v, expr(
        "vuser = user_id AND vtus > ptus - 1800000000 AND vtus <= ptus"))
      .groupBy(col("user_id"), col("purchase_id"), col("ptus"))
      .agg(count(lit(1)).as("n_views_30m"))
      .orderBy("user_id", "purchase_id")
    assertTwin(CdcStream.queries("stream_interval_join")(spark, sf), batch)
  }

  test("throughput probe (noop sink) runs the upsert state machine and records progress") {
    // the bench's sf10 streaming point runs this probe instead of the
    // memory-sink twin (emissions no longer fit a driver sink there);
    // pin that it drives the same state machine: progress recorded,
    // input rows == the landed change log, state rows == distinct keys
    CdcStream.progressLog.remove("cdc_stream_apply")
    CdcStream.applyThroughputProbe(spark, sf).collect()
    val prog = CdcStream.progressLog.get("cdc_stream_apply")
      .getOrElse(fail("probe recorded no progress"))
    val logDf = graft.operators.CdcSuite.changeLog(spark, sf)
    assert(prog.map(_._1).sum == logDf.count(), "probe must ingest the full change log")
    assert(prog.map(_._3).last == logDf.select("id").distinct.count(),
      "final state rows must equal distinct keys")
  }
}
