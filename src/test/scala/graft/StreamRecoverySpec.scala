package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.{CdcSuite, DedupSuite}
import graft.sources.{Scratch, Tables}
import graft.streaming.CdcStream
import graft.streaming.CdcStream.ChangeEvent

/** Checkpoint-recovery proof for the stateful streaming twins — the
  * reference pipeline's defining production property is durable resume
  * (Kafka offsets + connector restart; ref: docker/configs connector
  * restart semantics, debezium offset storage). Each test runs a query
  * over a durable `checkpointLocation` on PART of the input, lets it
  * terminate (a clean stop after batch k — `AvailableNow` drains what
  * exists), lands the remaining files, and starts a NEW query over the
  * SAME checkpoint. The second run must resume from the recovered state
  * store + file-source offsets: it sees only the new files, so the final
  * answer equals the batch oracle ONLY if run 1's per-key state survived
  * the restart. Each test also asserts the fixture actually discriminates
  * (some part of the answer is impossible without cross-run state), so a
  * silent recovery failure cannot pass.
  *
  * Abstract over the state-store backend: the concrete suites below run
  * the same five scenarios on the heap-backed default provider AND on
  * RocksDB with changelog checkpointing — the provider class is pinned
  * into the checkpoint's offset-log metadata at first start, so setting
  * it before run 1 proves the RESTART path (changelog replay into a
  * fresh RocksDB instance) too, not just steady-state operation.
  */
abstract class StreamRecoveryBehaviors extends SparkSpecBase with WithSessionConfs {

  /** Write df as `parts` parquet files into a staging dir; return the
    * part files sorted by name.
    */
  private def stage(df: DataFrame, parts: Int): (Path, Seq[Path]) = {
    val staging = Paths.get(Scratch.dir("rec_stage"))
    df.repartition(parts).write.mode("overwrite").parquet(staging.toString)
    val files = Files.list(staging).iterator.asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .toSeq.sortBy(_.getFileName.toString)
    (staging, files)
  }

  private def copyIn(files: Seq[Path], inputDir: String): Unit =
    files.foreach(f =>
      Files.copy(f, Paths.get(inputDir).resolve(f.getFileName.toString)))

  /** Run one streaming query to completion over whatever files currently
    * sit in `input`, against the shared durable checkpoint; return a
    * batch snapshot of THIS run's emissions (the memory sink starts
    * empty on every run — exactly like a restarted process).
    */
  private def runApply(input: String, schema: StructType, cp: String): DataFrame = {
    import SparkTestSession.spark.implicits._
    val events = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(input).as[ChangeEvent]
    // foreachBatch, not the memory sink: memory does not support
    // restarting from a checkpoint, and foreachBatch-into-storage is the
    // production sink shape anyway (ref: JDBC sink upsert per batch)
    val out = Scratch.dir("rec_apply_out")
    val q = CdcStream.applyEventsStream(events)
      .writeStream
      .foreachBatch((df: DataFrame, _: Long) =>
        df.write.mode("append").parquet(out))
      .option("checkpointLocation", cp)
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    readOut(out, Seq("id" -> "long", "custkey" -> "long", "status" -> "string",
      "op" -> "string", "seq" -> "long"))
  }

  test("cdc_stream_apply recovers per-key LWW state across a restart") {
    val log = CdcSuite.changeLog(spark, sf)
    val (_, files) = stage(log, 4)
    val schema = spark.read.parquet(files.head.getParent.toString).schema
    val input = Scratch.dir("rec_apply_in")
    val cp = Scratch.dir("rec_apply_cp")
    val (h1, h2) = files.splitAt(2)

    // The fixture must discriminate: some key's WINNING (max-seq) event
    // arrives before the stop while more of its events arrive after the
    // restart. For those keys run 2's emission is only correct if run 1's
    // state was recovered — a lost state store would re-derive the key
    // from run-2 events alone and emit a stale (lower-seq) image, and the
    // chronological sink-upsert combine below would keep that stale image.
    val r1 = spark.read.parquet(h1.map(_.toString): _*)
    val r2 = spark.read.parquet(h2.map(_.toString): _*)
    val needState = r1.groupBy("id").agg(max("seq").as("s1"))
      .join(r2.groupBy("id").agg(max("seq").as("s2")), "id")
      .filter(col("s1") > col("s2"))
    assert(needState.count() > 0, "fixture does not exercise cross-run state")

    copyIn(h1, input)
    val e1 = runApply(input, schema, cp)
    copyIn(h2, input)
    val e2 = runApply(input, schema, cp)

    // run 2 must not re-read run-1 files (offset recovery)…
    assert(e2.count() < e1.count() + r2.count(),
      "restarted query reprocessed already-committed files")

    // …and the recovered sink state must equal the batch oracle. Combine
    // like the JDBC sink the reference uses: upsert by key in emission
    // order, so a key's latest chronological emission wins (run 2 over
    // run 1, highest seq within a run).
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id")).orderBy(desc("run"), desc("seq"))
    val recovered = e1.withColumn("run", lit(1))
      .unionByName(e2.withColumn("run", lit(2)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "d")
      .select("id", "custkey", "status")
      .orderBy("id")
    val batch = CdcSuite.queries("cdc_apply_latest")(spark, sf)
    assert(recovered.collect().map(_.toSeq).toSeq ===
      batch.collect().map(_.toSeq).toSeq)
  }

  /** Read a foreachBatch output dir that may be empty (a run killed
    * before its first commit, or a resume with nothing left to do).
    */
  private def readOut(out: String, cols: Seq[(String, String)]): DataFrame = {
    val fs = new java.io.File(out).listFiles
    if (fs != null && fs.exists(_.getName.startsWith("part-"))) spark.read.parquet(out)
    else cols.foldLeft(spark.range(0).toDF)((d, c) =>
      d.withColumn(c._1, lit(null).cast(c._2))).select(cols.map(c => col(c._1)): _*)
  }

  test("cdc_stream_apply survives a mid-flight kill: uncommitted batch replays") {
    import SparkTestSession.spark.implicits._
    val log = CdcSuite.changeLog(spark, sf)
    val (_, files) = stage(log, 8)
    val dir = files.head.getParent.toString
    val schema = spark.read.parquet(dir).schema
    val input = Scratch.dir("rec_kill_in")
    val cp = Scratch.dir("rec_kill_cp")
    copyIn(files, input) // ALL input present — the kill, not the data, splits the runs
    val out1 = Scratch.dir("rec_kill_out")
    val events = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(input).as[ChangeEvent]
    val q = CdcStream.applyEventsStream(events)
      .writeStream
      .foreachBatch((df: DataFrame, _: Long) =>
        df.write.mode("append").parquet(out1))
      .option("checkpointLocation", cp)
      .outputMode("update")
      .trigger(Trigger.ProcessingTime(200)).start()
    // stop() mid-stream once >= 2 batches committed: unlike AvailableNow
    // termination this can tear an in-flight batch, whose foreachBatch
    // side effects may have landed without an offset commit — the
    // restart must replay it, and the upsert combine must absorb the
    // duplicate emissions
    val deadline = System.currentTimeMillis + 60000
    while (q.recentProgress.count(_.numInputRows > 0) < 2 &&
        System.currentTimeMillis < deadline) Thread.sleep(25)
    q.stop()
    q.awaitTermination()
    assert(q.recentProgress.exists(_.numInputRows > 0), "query never processed a batch")
    val emCols = Seq("id" -> "long", "custkey" -> "long", "status" -> "string",
      "op" -> "string", "seq" -> "long")
    val e1 = readOut(out1, emCols).localCheckpoint()
    val e2 = runApply(input, schema, cp)

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id")).orderBy(desc("run"), desc("seq"))
    val recovered = e1.withColumn("run", lit(1))
      .unionByName(e2.withColumn("run", lit(2)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "d")
      .select("id", "custkey", "status")
      .orderBy("id")
    val batch = CdcSuite.queries("cdc_apply_latest")(spark, sf)
    assert(recovered.collect().map(_.toSeq).toSeq ===
      batch.collect().map(_.toSeq).toSeq)
  }

  test("windowed aggregation state survives a restart (built-in agg state store)") {
    // the other tests cover flatMapGroupsWithState state; this covers
    // the BUILT-IN streaming aggregation state (window + key → partial
    // count), which lives in a different state-store format. Watermark
    // delay spans the whole fixture so the RECOVERED watermark can
    // never drop the second run's out-of-order files as late.
    val ev = Tables.events(spark, sf).select(col("ts"), col("event_type"))
    val (_, files) = stage(ev, 4)
    val schema = spark.read.parquet(files.head.getParent.toString).schema
    val input = Scratch.dir("rec_win_in")
    val cp = Scratch.dir("rec_win_cp")
    val (h1, h2) = files.splitAt(2)
    def runCounts(): DataFrame = {
      val out = Scratch.dir("rec_win_out")
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(input)
        .withWatermark("ts", "3650 days")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("win_start"), col("event_type"), col("n"))
        .writeStream
        .foreachBatch((df: DataFrame, _: Long) =>
          df.write.mode("append").parquet(out))
        .option("checkpointLocation", cp)
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      readOut(out, Seq("win_start" -> "timestamp", "event_type" -> "string", "n" -> "long"))
    }
    // discrimination: some (hour, event_type) groups must have rows on
    // BOTH sides of the restart — their final count is only correct if
    // run 1's partial aggregate state was recovered
    val keys = { (h: Seq[Path]) =>
      spark.read.parquet(h.map(_.toString): _*)
        .select(date_trunc("hour", col("ts")).as("w"), col("event_type")).distinct()
    }
    assert(keys(h1).intersect(keys(h2)).count() > 0,
      "fixture split produced no cross-restart windows")

    copyIn(h1, input)
    val c1 = runCounts()
    copyIn(h2, input)
    val c2 = runCounts()
    // counts per key are monotone across emissions; the max over both
    // runs' emissions is the final count for that key
    val recovered = c1.unionByName(c2)
      .groupBy(col("win_start"), col("event_type"))
      .agg(max(col("n")).as("n"))
      .orderBy("win_start", "event_type")
    val batch = ev
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))
      .orderBy("win_start", "event_type")
    assert(recovered.collect().map(_.toSeq).toSeq ===
      batch.collect().map(_.toSeq).toSeq)
  }

  test("stream-stream join state survives a restart (symmetric join state)") {
    // fourth state format: the symmetric-hash stream-stream join buffers
    // both sides in the state store. A match whose purchase landed
    // before the stop and whose view lands after (or vice versa) can
    // only be emitted if the buffered side was recovered. Watermarks
    // span the fixture so the recovered watermark never purges or
    // late-drops the second run's rows.
    val ev = Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("pts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("vuser"), col("ts").as("vts"))
    val (_, pFiles) = stage(p, 4)
    val (_, vFiles) = stage(v, 4)
    val pIn = Scratch.dir("rec_ivj_p")
    val vIn = Scratch.dir("rec_ivj_v")
    val cp = Scratch.dir("rec_ivj_cp")
    val pSchema = spark.read.parquet(pFiles.head.getParent.toString).schema
    val vSchema = spark.read.parquet(vFiles.head.getParent.toString).schema
    val (p1, p2) = pFiles.splitAt(2)
    val (v1, v2) = vFiles.splitAt(2)
    def cond = expr(
      "vuser = user_id AND vts > pts - INTERVAL 30 MINUTES AND vts <= pts")

    // discriminator: some matches must straddle the restart boundary
    def half(h: Seq[Path]) = spark.read.parquet(h.map(_.toString): _*)
    val straddling = half(p1).join(half(v2), cond).count() +
      half(p2).join(half(v1), cond).count()
    assert(straddling > 0, "fixture split produced no cross-restart matches")

    def run(): DataFrame = {
      val out = Scratch.dir("rec_ivj_out")
      val ps = spark.readStream.schema(pSchema)
        .option("maxFilesPerTrigger", "1").parquet(pIn)
        .withWatermark("pts", "3650 days")
      val vs = spark.readStream.schema(vSchema)
        .option("maxFilesPerTrigger", "1").parquet(vIn)
        .withWatermark("vts", "3650 days")
      val q = ps.join(vs, cond)
        .select(col("user_id"), col("purchase_id"), unix_micros(col("pts")).as("ptus"))
        .writeStream
        .foreachBatch((df: DataFrame, _: Long) =>
          df.write.mode("append").parquet(out))
        .option("checkpointLocation", cp)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      readOut(out, Seq("user_id" -> "long", "purchase_id" -> "long", "ptus" -> "long"))
    }
    copyIn(p1, pIn); copyIn(v1, vIn)
    val m1 = run()
    copyIn(p2, pIn); copyIn(v2, vIn)
    val m2 = run()
    // append-mode inner join emits each (purchase, view) match exactly
    // once across the clean-stop runs; counts roll up per purchase
    def rollup(df: DataFrame): DataFrame = df
      .groupBy(col("user_id"), col("purchase_id"), col("ptus"))
      .agg(count(lit(1)).as("n_views_30m"))
      .orderBy("user_id", "purchase_id")
    val recovered = rollup(m1.unionByName(m2))
    val batch = rollup(p.join(v, cond)
      .select(col("user_id"), col("purchase_id"), unix_micros(col("pts")).as("ptus")))
    assert(recovered.collect().map(_.toSeq).toSeq ===
      batch.collect().map(_.toSeq).toSeq)
  }

  /** Dedup horizon matching CdcStream.dedupMinhash: effectively infinite
    * for the finite replay.
    */
  private val TtlMs: Long = 100L * 365 * 24 * 3600 * 1000

  private def runPairs(input: String, schema: StructType, cp: String): DataFrame = {
    import SparkTestSession.spark.implicits._
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(input)
      .as[(String, Long, java.sql.Timestamp)]
    val out = Scratch.dir("rec_mh_out")
    val q = CdcStream.minhashPairsStream(stream, TtlMs, "1 minute")
      .toDF("doc_a", "doc_b")
      .writeStream
      .foreachBatch((df: DataFrame, _: Long) =>
        df.write.mode("append").parquet(out))
      .option("checkpointLocation", cp)
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.read.parquet(out)
  }

  test("stream_dedup_minhash recovers per-bucket LSH state across a restart") {
    org.apache.spark.sql.graft.Bridge.register(spark)
    val sh = DedupSuite.shingleSets(spark, sf).localCheckpoint()
    val bands = DedupSuite.minhashBands(sh)
      .select(concat_ws("|", col("band"), col("bucket")).as("k"), col("doc_id"),
        lit("2000-01-01 00:00:00").cast("timestamp").as("ets"))
    val (_, files) = stage(bands, 4)
    val schema = spark.read.parquet(files.head.getParent.toString).schema
    val input = Scratch.dir("rec_mh_in")
    val cp = Scratch.dir("rec_mh_cp")
    val (h1, h2) = files.splitAt(2)

    copyIn(h1, input)
    val p1 = runPairs(input, schema, cp)
    copyIn(h2, input)
    val p2 = runPairs(input, schema, cp)

    val verify = { cands: DataFrame =>
      cands.dropDuplicates("doc_a", "doc_b")
        .join(sh.withColumnRenamed("doc_id", "doc_a")
          .withColumnRenamed("shingles", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("shingles", "sh_b"), "doc_b")
        .withColumn("jaccard", expr("jaccard_sim(sh_a, sh_b)"))
        .filter(col("jaccard") >= 0.7)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    }
    val recovered = verify(p1.unionByName(p2))
    val batch = DedupSuite.queries("dedup_minhash_lsh")(spark, sf)
    assert(recovered.collect().map(_.toSeq).toSeq ===
      batch.collect().map(_.toSeq).toSeq)

    // Discrimination: at least one FINAL pair must be co-bucketed only
    // ACROSS the restart boundary — doc_a's band row before the stop,
    // doc_b's after — so it cannot be emitted from either run's files
    // alone. Its presence in the (oracle-equal) result proves the bucket
    // membership state physically survived the restart.
    def within(half: Seq[Path]): DataFrame = {
      val h = spark.read.parquet(half.map(_.toString): _*)
      h.select(col("k"), col("doc_id").as("doc_a"))
        .join(h.select(col("k"), col("doc_id").as("doc_b")), "k")
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
    }
    val crossOnly = recovered.select("doc_a", "doc_b")
      .except(within(h1).unionByName(within(h2)))
    assert(crossOnly.count() > 0,
      "fixture split produced no cross-restart-only pairs; split differently")
  }
}

/** The five recovery scenarios on the default (heap-backed HDFS) state
  * store provider.
  */
class StreamRecoverySpec extends StreamRecoveryBehaviors {
  def sessionConfs: Map[String, String] = Map.empty
}

/** The same five recovery scenarios on RocksDB + changelog
  * checkpointing — the backend an unbounded production CDC feed needs
  * (ref: docker/configs/kafka-connect/postgresql-sink.json's
  * continuous-ingest contract), where per-key state must not live on
  * the executor heap.
  */
class StreamRecoveryRocksDbSpec extends StreamRecoveryBehaviors {
  def sessionConfs: Map[String, String] = RocksDbConfs.confs
}
