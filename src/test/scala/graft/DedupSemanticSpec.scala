package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Semantic (k-means-cell-bucketed) dedup — the SemDeDup shape. The
  * candidate generator is the learned cell, so the guard that matters is
  * the same one the LSH family proves in LshGuardSpec: a COLLAPSED cell
  * (many near-identical embeddings — boilerplate, padding vectors, a
  * dead encoder) would make the within-cell self-join quadratic; the
  * `maxCell` gate drops it while genuine near-dup pairs in healthy cells
  * survive. Fixture determinism: seeds are the k smallest 60-bit
  * md5(vec_id) hashes, so the spec pins ids whose hash rank was computed
  * offline (9085 ranks in the top-8 of {1..500, 9085, 19085} — it MUST
  * seed, guaranteeing the genuine pair its own cell away from the blob).
  */
class DedupSemanticSpec extends SparkSpecBase {

  private def vec(xs: Double*) = xs.map(_.toFloat).toArray

  test("poisoned cell is dropped; genuine pair in a healthy cell survives") {
    val s = spark
    import s.implicits._
    // 500 IDENTICAL vectors: every pair has cos = 1, 500·499/2 ≈ 125k
    // pairs uncapped — the collapsed-embedding failure mode. All 500 tie
    // to the lowest-cid blob seed (strict '<' argmin), so they form ONE
    // cell of 500 > maxCell.
    val blob = (1 to 500).map(i => (i.toLong, vec(1, 0, 0, 0)))
    // genuine near-dup pair, orthogonal to the blob; 9085 hash-ranks
    // into the top-8 seeds so the pair's cell exists and has size 2
    val pair = Seq(
      (9085L, vec(0, 1, 0, 0)),
      (19085L, vec(0, 0.999, 0.01, 0)))
    val corpus = (blob ++ pair).toDF("vec_id", "embedding")
    val pairs = graft.api.Graft
      .semanticDedupPairs(corpus, "vec_id", "embedding",
        threshold = 0.9, k = 8, maxCell = 100L)
      .collect()
    assert(pairs.forall(r => r.getAs[Long]("vec_a") > 500L),
      s"collapsed-cell pairs leaked: ${pairs.take(3).mkString}")
    assert(pairs.length == 1 &&
      pairs.head.getAs[Long]("vec_a") == 9085L &&
      pairs.head.getAs[Long]("vec_b") == 19085L,
      s"genuine pair must survive the cap, got ${pairs.mkString}")
    assert(pairs.head.getAs[Double]("cos") >= 0.999,
      "near-identical pair scores near 1")
  }

  test("near-identical vectors land in the same cell regardless of clustering quality") {
    val s = spark
    import s.implicits._
    // the property recall rests on: a near-dup pair assigns to the SAME
    // nearest centroid (their distance to every centroid is ~equal), so
    // cell-bucketing cannot split it however badly the seeds fall. Three
    // separated clusters, k deliberately wrong (2), jittered members.
    val corpus = (0 until 3).flatMap { c =>
      (0 until 20).map { i =>
        val base = Array.fill(4)(0f); base(c) = 1f
        base(3) = (i % 7) * 0.01f // deterministic jitter, off-axis
        ((c * 100 + i).toLong, base)
      }
    }.toDF("vec_id", "embedding")
    val pairs = graft.api.Graft
      .semanticDedupPairs(corpus, "vec_id", "embedding",
        threshold = 0.999, k = 2, maxCell = 4096L)
    // exact duplicates exist within each cluster (jitter repeats every
    // 7): each must be found — same cell, cos = 1
    val exactDups = pairs.filter(col("cos") >= 1.0).count()
    assert(exactDups >= 3 * 2, // ≥2 repeated-jitter pairs per cluster
      s"same-cell property lost exact duplicates (found $exactDups)")
  }

  test("lake fixture stays far below the default cap (uncapped oracle stays green)") {
    // mirror of LshGuardSpec's invariance test: the registry entry gates
    // at 4096 while the DuckDB oracle runs uncapped — prove no fixture
    // cell approaches the cap at spec scale, and that the gate is a
    // no-op there (identical pair count).
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val capped = graft.api.Graft
      .semanticDedupPairs(e, "vec_id", "embedding", threshold = 0.8)
    val uncapped = graft.api.Graft
      .semanticDedupPairs(e, "vec_id", "embedding", threshold = 0.8,
        maxCell = Long.MaxValue)
    assert(capped.count() == uncapped.count(),
      "default cap must not touch any fixture cell")
  }

  test("stream_dedup_semantic: N micro-batch probes equal one bulk probe, cost per fold ∝ batch") {
    import graft.operators.{AnnSuite, DedupSuite}
    // the streaming twin folds the injected copies in as 4 one-file
    // micro-batches, each probing the standing cell index; the
    // assign-at-fixed-centroids algebra says the union of the folds
    // equals ONE bulk (standing × batch) same-cell verify
    val streamed = graft.streaming.CdcStream.queries("stream_dedup_semantic")(spark, sf)
      .collect().map(_.toString).toSeq
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val k = DedupSuite.semanticK(spark, sf)
    val idx = AnnSuite.ivfBuild(e, "vec_id", "embedding", k)
    val standing = DedupSuite.gateHotBuckets(idx.assigned, Seq("cell"))
      .select(col("cand_id").as("vec_a"), col("cell"), col("ce2").as("emb_a"))
    val batch = e.filter(col("vec_id") % 10 === 0)
      .withColumn("embedding", expr("transform(embedding, (v, i) -> IF(i = 0, -v, v))"))
      .withColumn("vec_id", col("vec_id") + 1000000L)
    val assigned = AnnSuite.kmeansAssign(batch, idx.centroids)
      .select(col("vec_id").as("vec_b"), col("cid").as("cell"),
        col("embedding").as("emb_b"))
    val bulk = standing.join(assigned, Seq("cell"))
      .withColumn("cos", floor(expr("cosine_sim(emb_a, emb_b)") * 1e6 + 0.5) / 1e6)
      .filter(col("cos") >= 0.8)
      .select("cell", "vec_a", "vec_b", "cos")
      .orderBy("cell", "vec_a", "vec_b")
      .collect().map(_.toString).toSeq
    assert(streamed.nonEmpty && streamed === bulk)
    // per-fold cost ∝ batch: the feed was consumed through exactly the
    // 4 metered one-file micro-batches, never one bulk pass
    val prog = graft.streaming.CdcStream.progressLog("stream_dedup_semantic")
    val dataBatches = prog.filter(_._1 > 0)
    assert(dataBatches.length == 4,
      s"expected 4 one-file micro-batch probes, got ${dataBatches.length}")
    assert(dataBatches.map(_._1).sum ===
      e.filter(col("vec_id") % 10 === 0).count())
  }

  test("footer-derived semanticK matches the ⌈√n⌉ rule and skips the corpus count job") {
    // the lake-pinned entries pass k = semanticK (parquet-footer
    // metadata) instead of defaulting it — the defaulted path runs one
    // full-corpus count() job before any real work (a wasted scan at
    // 100 TB). Footer counts are exact, so the value is identical...
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val n = e.count()
    val expectK = math.max(10L, math.ceil(math.sqrt(n.toDouble)).toLong).toInt
    assert(graft.operators.DedupSuite.semanticK(spark, sf) === expectK)

    // ...and the explicit-k construction runs exactly ONE fewer Spark
    // job than the defaulted one (the dropped count). Jobs are counted
    // over semanticCells' eager construction (its localCheckpoints run
    // jobs at build time), same input both ways, so the delta is
    // deterministic.
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    def jobsDuring(body: => Unit): Int = {
      spark.sparkContext.addSparkListener(listener)
      jobs.set(0)
      try {
        body
        // listener events are async; the actions in body are blocking,
        // so poll briefly until the count is stable
        var last = -1
        var spins = 0
        while (jobs.get() != last && spins < 50) {
          last = jobs.get(); spins += 1; Thread.sleep(100)
        }
      } finally spark.sparkContext.removeSparkListener(listener)
      jobs.get()
    }
    val countJobs = jobsDuring { e.count(): Unit } // AQE may split it in 2
    val defaulted = jobsDuring {
      graft.api.Graft.semanticCells(e, "vec_id", "embedding")
    }
    val explicit = jobsDuring {
      graft.api.Graft.semanticCells(e, "vec_id", "embedding", k = expectK)
    }
    // monotonic property only: AQE and localCheckpoint job splitting
    // make EXACT job counts version- and timing-sensitive (the async
    // listener adds its own race) — the contract is just that the
    // explicit-k path skips the count probe, i.e. runs strictly fewer
    // jobs than the defaulted one
    assert(countJobs >= 1 && defaulted > explicit,
      s"explicit k must skip the count probe's jobs " +
        s"(defaulted=$defaulted, explicit=$explicit, count=$countJobs)")
  }

  test("torn-batch replay: a landed-but-uncommitted probe segment is rewritten, never duplicated") {
    // the streaming twin's sink contract (the same batchId-keyed
    // overwrite stream_ivf_append proves in IvfPersistSpec): if the
    // process dies AFTER a micro-batch's pair segment lands but BEFORE
    // the offset commit, the checkpoint re-drives that batchId and the
    // replay OVERWRITES the torn segment — zero duplicate pairs, and
    // the final table equals the bulk (standing × batch) probe.
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    import graft.operators.{AnnSuite, DedupSuite}
    import graft.sources.Scratch
    org.apache.spark.sql.graft.Bridge.register(spark)
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val k = DedupSuite.semanticK(spark, sf)
    val idxDir = Scratch.dir("sem_torn_idx")
    val idx = AnnSuite.ivfBuild(e, "vec_id", "embedding", k)
    AnnSuite.ivfSave(
      idx.copy(assigned = DedupSuite.gateHotBuckets(idx.assigned, Seq("cell"))),
      idxDir)
    val batch = e.filter(col("vec_id") % 10 === 0)
      .withColumn("embedding", expr("transform(embedding, (v, i) -> IF(i = 0, -v, v))"))
      .withColumn("vec_id", col("vec_id") + 1000000L)
    val feed = Scratch.dir("sem_torn_feed")
    batch.repartition(4).write.mode("overwrite").parquet(feed)
    val outDir = Scratch.dir("sem_torn_out")
    val cp = Scratch.dir("sem_torn_cp")
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)

    def run(injectCrash: Boolean): Unit = {
      val q = spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1").parquet(feed)
        .writeStream
        .foreachBatch { (df: DataFrame, batchId: Long) =>
          graft.streaming.CdcStream.semanticProbeBatch(spark, idxDir, df)
            .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
          // die AFTER the landing, BEFORE the checkpoint's offset commit
          if (injectCrash && batchId == 2 && crashed.compareAndSet(false, true))
            throw new RuntimeException("injected torn-batch crash")
        }
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination()
      catch {
        case ex: org.apache.spark.sql.streaming.StreamingQueryException
            if injectCrash && ex.getMessage.contains("injected torn-batch crash") => ()
      }
    }

    run(injectCrash = true)
    assert(crashed.get, "the injected crash never fired — batch 2 was not reached")
    run(injectCrash = false) // restart: the checkpoint replays batch 2

    val streamed = spark.read.parquet(outDir)
      .select("cell", "vec_a", "vec_b", "cos")
    val dupPairs = streamed.groupBy("vec_a", "vec_b")
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    assert(dupPairs === 0, s"replay duplicated $dupPairs flagged pairs")
    // equality to ONE bulk (standing × batch) probe — the same oracle
    // algebra the clean-run equality test pins above
    val standing = DedupSuite.gateHotBuckets(idx.assigned, Seq("cell"))
      .select(col("cand_id").as("vec_a"), col("cell"), col("ce2").as("emb_a"))
    val assignedAll = AnnSuite.kmeansAssign(batch, idx.centroids)
      .select(col("vec_id").as("vec_b"), col("cid").as("cell"),
        col("embedding").as("emb_b"))
    val bulk = standing.join(assignedAll, Seq("cell"))
      .withColumn("cos", floor(expr("cosine_sim(emb_a, emb_b)") * 1e6 + 0.5) / 1e6)
      .filter(col("cos") >= 0.8)
      .select("cell", "vec_a", "vec_b", "cos")
    assert(streamed.orderBy("cell", "vec_a", "vec_b").collect().map(_.toString).toSeq
      === bulk.orderBy("cell", "vec_a", "vec_b").collect().map(_.toString).toSeq)
  }

  test("probe sees committed append segments (standing read rides ivfLoad)") {
    // the twin's standing read goes through ivfLoad (base ∪ committed
    // segments); a probe against an index that HAS a committed
    // ivfAppend segment must include pairs against the appended rows —
    // reading assigned.parquet directly was correct only incidentally
    // (every caller rebuilt the index fresh per run)
    import graft.operators.{AnnSuite, DedupSuite}
    import graft.sources.Scratch
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val idxDir = Scratch.dir("sem_seg_idx")
    AnnSuite.ivfSave(
      AnnSuite.ivfBuild(e, "vec_id", "embedding", DedupSuite.semanticK(spark, sf)),
      idxDir)
    // a segment committed AFTER the base build (the living-index shape):
    // an exact copy of vec 7 under a fresh id — same cell as vec 7
    val seg = e.filter(col("vec_id") === 7L)
      .withColumn("vec_id", col("vec_id") + 2000000L)
    graft.api.Graft.ivfAppend(spark, idxDir, seg, "vec_id", "embedding", batchId = 0L)
    // the probing batch: another exact copy — cos 1.0 against both the
    // base row and the appended row
    val batch = e.filter(col("vec_id") === 7L)
      .withColumn("vec_id", col("vec_id") + 3000000L)
    val pairs = graft.streaming.CdcStream.semanticProbeBatch(spark, idxDir, batch)
      .filter(col("vec_a") === 2000007L).collect()
    assert(pairs.length === 1 && pairs.head.getAs[Long]("vec_b") === 3000007L,
      s"committed append segment invisible to the probe: ${pairs.mkString}")
  }
}
