package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generation-manifested segment storage — the shared maintenance
  * discipline behind every "living index" in the engine (IVF
  * assignments, IVFADC code tables, the streaming substring-dedup
  * window-hash index). The reference's incremental reconciliation
  * keeps a watermark table and re-reads only what moved
  * (ref: src/reconciliation/incremental/watermark.py:1,
  * incremental.py:1); the lake analog for an APPEND-ONLY index is
  * batchId-keyed segments plus manifest-committed compactions, which
  * is what this implements.
  *
  * Layout inside an index directory:
  *   - generation 0: `<base0>` (the initial build) + `<appends0>/
  *     batch_id=<id>/...` segments, no manifest;
  *   - each compaction commits `MANIFEST-<n>` naming a folded
  *     `<vBase><n>.parquet` base and a fresh `<vAppends><n>.parquet`
  *     segment root, plus the folded-batchId WATERMARK.
  *
  * Crash-safety invariants (spec-pinned in IvfPersistSpec):
  *   - a torn segment write is healed by replay: [[append]] OVERWRITES
  *     exactly its own `batch_id=` directory, so re-driving a batch
  *     whose landing succeeded but whose offset commit did not rewrites
  *     the same rows instead of duplicating them;
  *   - a torn compaction is invisible: the folded base lands under the
  *     NEXT generation's name (idempotent redo), and the generation
  *     only exists once its manifest commits (a torn manifest write is
  *     self-invalidating — [[resolve]] requires the trailing newline);
  *   - a replay ACROSS a compaction is a no-op: the manifest carries
  *     the highest batchId folded into the base, and [[append]]
  *     refuses ids at or below it — without this, a checkpoint replay
  *     arriving after its original segment was folded would land the
  *     rows a second time (they already live in the new base). This
  *     requires batch ids to be MONOTONICALLY INCREASING per index,
  *     which is exactly foreachBatch's batchId contract;
  *   - DELETES are tombstone segments in a third channel
  *     (`<deletes><gen>/batch_id=<id>/`): [[appendDeletes]] lands a
  *     batch of keys, [[load]] anti-joins them (broadcast — tombstones
  *     are bounded by the delete traffic between compactions, never
  *     corpus-sized), and a compaction PURGES them physically (the
  *     folded base is the reader view, which already excludes them;
  *     the new generation's delete channel holds only the CARRIED
  *     tombstones — keys that matched no row yet, kept so a delete
  *     that preceded its insert still kills the row when it lands
  *     after the fold — see [[compact]]).
  *     Delete-wins semantics: a tombstoned key is masked no matter
  *     which segment carries it or in which order the batches landed —
  *     re-inserting a deleted key is out of contract (keys are unique
  *     corpus ids; a delete is terminal, the right-to-be-forgotten
  *     shape). Tombstone replays share the append channel's watermark
  *     rules, and the watermark is what stops RESURRECTION: an
  *     append-batch replay arriving after a compaction folded both the
  *     batch and a later delete of its rows is refused, so the deleted
  *     rows cannot ride back in through the replay. Stores whose keys
  *     legitimately UPDATE in place read through [[loadLww]] instead —
  *     last op per key wins by batchId, and deletes stop being
  *     terminal;
  *   - readers and the compactor are isolated by GENERATION RETENTION:
  *     committing generation n+1 retires generation n−1, never n, so
  *     an in-flight reader that resolved the pre-compaction layout
  *     keeps a complete generation on disk until the NEXT compaction.
  *     (Single-WRITER discipline still applies: run append and compact
  *     from one maintenance loop.)
  */
object SegmentStore {

  /** Directory-naming scheme of one segment store. `vBase`/`vAppends`/
    * `vDeletes` are PREFIXES: generation n's dirs are
    * `<vBase><n>.parquet` / `<vAppends><n>.parquet` /
    * `<vDeletes><n>.parquet` (prefix form so [[reset]] can clear every
    * generation without knowing how many exist). The delete channel's
    * names default off the append channel's, but stores sharing one
    * index directory must pick non-colliding explicit names.
    */
  case class Scheme(base0: String, appends0: String,
      vBase: String, vAppends: String,
      deletes0: String = "deletes.parquet", vDeletes: String = "deletes_v",
      purged0: String = "purged.parquet") {
    def baseOf(gen: Int): String = if (gen == 0) base0 else s"$vBase$gen.parquet"
    def appendsOf(gen: Int): String =
      if (gen == 0) appends0 else s"$vAppends$gen.parquet"
    def deletesOf(gen: Int): String =
      if (gen == 0) deletes0 else s"$vDeletes$gen.parquet"
  }

  /** The resolved CURRENT view: base + appends dir names, generation
    * number, and the folded-batchId watermark (−1 before any
    * compaction).
    */
  case class Layout(base: String, appends: String, gen: Int, folded: Long)

  private def fileSystem(spark: SparkSession, dir: String)
      : org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** Resolve the store's current layout: the HIGHEST manifest that
    * parses completely (trailing newline — a torn write is
    * self-invalidating) and whose base dir exists wins; else fall back
    * a generation; else generation 0. Manifest grammar:
    * `v2 <base> <appends> <foldedWatermark>\n` (v1 lines — no
    * watermark — still parse, folded = −1).
    */
  def resolve(spark: SparkSession, dir: String, scheme: Scheme): Layout = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = fileSystem(spark, dir)
    val manifests: Seq[(Int, org.apache.hadoop.fs.Path)] =
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("MANIFEST-"))
          n.stripPrefix("MANIFEST-").toIntOption.map(_ -> st.getPath)
        else None
      }.sortBy(-_._1)
    manifests.foreach { case (gen, mp) =>
      val in = fs.open(mp)
      val content =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      if (content.endsWith("\n")) content.trim.split(" ") match {
        case Array("v1", base, appends)
            if fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$base")) =>
          return Layout(base, appends, gen, -1L)
        case Array("v2", base, appends, folded)
            if folded.toLongOption.nonEmpty &&
              fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$base")) =>
          return Layout(base, appends, gen, folded.toLong)
        case _ => ()
      }
    }
    Layout(scheme.base0, scheme.appends0, 0, -1L)
  }

  /** Land one batch as an idempotent, batchId-keyed segment. Returns
    * false (and writes NOTHING) when `batchId` is at or below the
    * folded watermark — a checkpoint replay of a batch a compaction
    * already folded into the base. `batchId` must be monotonically
    * increasing per store (foreachBatch's contract); ad-hoc callers
    * own picking fresh ids above the watermark.
    */
  def append(spark: SparkSession, dir: String, scheme: Scheme,
      segment: DataFrame, partitionCols: Seq[String], batchId: Long): Boolean = {
    val lay = resolve(spark, dir, scheme)
    if (batchId <= lay.folded) return false
    val w = segment.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(s"$dir/${lay.appends}/batch_id=$batchId")
    true
  }

  /** Land one batch of TOMBSTONE KEYS as an idempotent, batchId-keyed
    * delete segment ([[load]] anti-joins them; the next compaction
    * purges them). Same watermark contract as [[append]]: ids share
    * the store's monotonic batch-id space, and a replay at or below
    * the folded watermark lands nothing — a tombstone whose rows a
    * compaction already removed must not reappear as a standing
    * (harmless but unbounded) mask.
    */
  def appendDeletes(spark: SparkSession, dir: String, scheme: Scheme,
      keys: DataFrame, batchId: Long): Boolean = {
    val lay = resolve(spark, dir, scheme)
    if (batchId <= lay.folded) return false
    keys.write.mode("overwrite")
      .parquet(s"$dir/${scheme.deletesOf(lay.gen)}/batch_id=$batchId")
    true
  }

  /** The current generation's committed tombstone keys, if any. */
  def deletes(spark: SparkSession, dir: String, scheme: Scheme)
      : Option[DataFrame] = {
    val lay = resolve(spark, dir, scheme)
    val dp = new org.apache.hadoop.fs.Path(s"$dir/${scheme.deletesOf(lay.gen)}")
    if (fileSystem(spark, dir).exists(dp))
      Some(spark.read.parquet(s"$dir/${scheme.deletesOf(lay.gen)}"))
    else None
  }

  /** The store's CUMULATIVE purged-key list, if any — every tombstone
    * key a `recordPurged` compaction ever folded (commit-versioned
    * append-only dirs; see [[compact]]). The durable
    * right-to-be-forgotten record: a rebuild from a source frame that
    * still carries deleted rows anti-joins this.
    */
  def purged(spark: SparkSession, dir: String, scheme: Scheme)
      : Option[DataFrame] = {
    val pp = new org.apache.hadoop.fs.Path(s"$dir/${scheme.purged0}")
    if (fileSystem(spark, dir).exists(pp))
      Some(spark.read.parquet(pp.toString).drop("commit").distinct())
    else None
  }

  /** Base ∪ committed segments, both passed through `normalize`
    * (column selection / partition-value type restoration). The union
    * preserves each leg's partition layout, so partition-column
    * predicates prune on both. `deleteKeys` names the store's key
    * columns: when tombstone segments exist, the view anti-joins them
    * out (broadcast — the tombstone set is delete-traffic-sized, and a
    * compaction purges it back to zero). Pass Nil for stores without a
    * delete channel — no join is added to the plan at all.
    */
  def load(spark: SparkSession, dir: String, scheme: Scheme,
      deleteKeys: Seq[String] = Nil)
      (normalize: DataFrame => DataFrame): DataFrame = {
    val lay = resolve(spark, dir, scheme)
    val base = normalize(spark.read.parquet(s"$dir/${lay.base}"))
    val ap = new org.apache.hadoop.fs.Path(s"$dir/${lay.appends}")
    val union =
      if (fileSystem(spark, dir).exists(ap))
        base.unionByName(normalize(spark.read.parquet(s"$dir/${lay.appends}")))
      else base
    if (deleteKeys.isEmpty) union
    else {
      val dp = new org.apache.hadoop.fs.Path(s"$dir/${scheme.deletesOf(lay.gen)}")
      if (!fileSystem(spark, dir).exists(dp)) union
      else union.join(
        org.apache.spark.sql.functions.broadcast(
          spark.read.parquet(s"$dir/${scheme.deletesOf(lay.gen)}")
            .select(deleteKeys.map(org.apache.spark.sql.functions.col): _*)),
        deleteKeys, "left_anti")
    }
  }

  /** LAST-WRITE-WINS reader view — the reference CDC sink's
    * insert-mode=upsert discipline (ref: docker/configs/kafka-connect/
    * postgresql-sink.json:1, last write by LSN wins per key) applied
    * to a segment store: per `keyCols` key, the row from the
    * HIGHEST-batchId append segment wins; the base counts as batchId
    * −∞ (any segment row supersedes it); a tombstone batch masks the
    * key only while no LATER append re-inserts it. So `op ∈ {c, u}`
    * both land as plain [[append]]s — an update of a live id
    * SUPERSEDES instead of duplicating — and a delete is no longer
    * terminal: the last op per key wins, exactly the semantics a CDC
    * feed of (op, key, row) envelopes needs. Within one batchId a key
    * must appear in at most ONE channel with ONE row (collapse the
    * envelope per key first — cdc_apply_latest — as foreachBatch gives
    * no intra-batch order); on an insert and a tombstone TYING at the
    * same batchId the tombstone wins (matches the terminal-delete
    * stores' delete-wins tie rule).
    *
    * Plan shape at scale: the winner computation runs on the DELTA
    * only (segments + tombstones, bounded by the traffic between
    * compactions — two small groupBys); the corpus-sized base pays
    * exactly one BROADCAST anti-join of the touched keys, the same
    * price as [[load]]'s tombstone mask. Partition layout of both
    * union legs is preserved, so partition-column pruning (e.g. the
    * IVF cell probes) holds.
    *
    * Two operating bounds a deployment owns (unenforced here):
    *   - the at-most-one-row-per-key-per-batch contract is NOT checked
    *     at read time (the winning-batch join passes every row of that
    *     batch through) — a violating writer makes the view serve
    *     duplicate rows for the key. The detection path is the
    *     scheduled recon pass: recon_index_lww's `dup_keys` invariant
    *     counts exactly these (must be 0 on a healthy LWW store);
    *   - `touched` (the broadcast anti-join side) grows with the
    *     DISTINCT keys written since the last compaction. Compact
    *     before it outgrows the broadcast threshold (~10M keys at
    *     default autoBroadcastJoinThreshold); recon_index_lww's
    *     `append_segments` / `superseded_rows` are the observable to
    *     alert on, and bench/lww_cadence.json carries the measured
    *     serving-wall degradation curve that sizes the cadence.
    */
  def loadLww(spark: SparkSession, dir: String, scheme: Scheme,
      keyCols: Seq[String])(normalize: DataFrame => DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, max}
    require(keyCols.nonEmpty, "loadLww requires the store's key columns")
    val lay = resolve(spark, dir, scheme)
    val fs = fileSystem(spark, dir)
    val base = normalize(spark.read.parquet(s"$dir/${lay.base}"))
    val ap = new org.apache.hadoop.fs.Path(s"$dir/${lay.appends}")
    val dp = new org.apache.hadoop.fs.Path(s"$dir/${scheme.deletesOf(lay.gen)}")
    if (!fs.exists(ap) && !fs.exists(dp)) return base
    val ks = keyCols.map(col)
    // batch_id is the segment dirs' partition column; delta-sized legs
    val segs =
      if (fs.exists(ap))
        Some(spark.read.parquet(ap.toString)
          .withColumn("__b", col("batch_id").cast("long")))
      else None
    val maxIns = segs.map(_.groupBy(ks: _*).agg(max("__b").as("__bi")))
    val maxDel =
      if (fs.exists(dp))
        Some(spark.read.parquet(dp.toString)
          .withColumn("__b", col("batch_id").cast("long"))
          .groupBy(ks: _*).agg(max("__b").as("__bd")))
      else None
    val status = (maxIns, maxDel) match {
      case (Some(i), Some(d)) => i.join(d, keyCols, "full_outer")
      case (Some(i), None) => i.withColumn("__bd",
        org.apache.spark.sql.functions.lit(null).cast("long"))
      case (None, Some(d)) => d.withColumn("__bi",
        org.apache.spark.sql.functions.lit(null).cast("long"))
      case (None, None) => return base // unreachable (guarded above)
    }
    // every touched key leaves the base; the winning insert rows of the
    // delta re-enter. Ties (__bi = __bd) go to the tombstone.
    val touched = status.select(ks: _*)
    val winners = status
      .filter(col("__bi").isNotNull &&
        (col("__bd").isNull || col("__bi") > col("__bd")))
      .select((ks :+ col("__bi").as("__b")): _*)
    val masked = base.join(broadcast(touched), keyCols, "left_anti")
    segs match {
      case Some(sg) =>
        val winRows = sg.join(broadcast(winners), keyCols :+ "__b")
          .drop("__b", "batch_id")
        masked.unionByName(normalize(winRows))
      case None => masked
    }
  }

  /** Fold base ∪ committed segments into generation gen+1 with
    * crash-safe land-then-swap (see object doc). `folded` must be the
    * frame to land — callers pass their reader-side union so fold ≡
    * read. Retains the newest `retain` PREVIOUS generations for
    * in-flight readers (default 1: committing n+1 retires n−1, never
    * n) and retires everything older. Size `retain` to the longest
    * query a deployment lets run across compaction cadences — a
    * reader stalling across MORE than `retain` compactions of the
    * same store loses files. Returns false (no-op) when there are no
    * committed segments in EITHER channel (appends or tombstones — a
    * deletes-only compaction is the physical-purge operation) UNLESS
    * `requireSegments = false` (a RETRAIN swaps in a re-derived base
    * even when nothing is pending). `crashBeforeCommit` is the specs'
    * torn-compaction hook: land, then "die" before the manifest
    * commit. `beforeCommit(nextGen)` lands generation-versioned
    * SIDECARS (e.g. a retrain's new centroids) inside the atomic
    * window — after the folded base, before the manifest, so a torn
    * run leaves them invisible; `onRetire(gen)` runs per retired
    * generation for the caller's sidecar GC. `sidecarPrefixes` names
    * the store's sidecar families (`<prefix><gen>.parquet`): before
    * the manifest commit, any `<prefix><next>` file THIS run's
    * `beforeCommit` did not just write is deleted — without this, a
    * torn RETRAIN's orphaned sidecars would become visible through a
    * later plain compaction's manifest and serve a mixed-generation
    * pair (new centroids/book against a base folded at the old
    * parameters).
    *
    * Tombstone handling at the fold is semantics-dependent:
    *   - TERMINAL-delete stores pass `deleteKeys`: tombstones whose
    *     key matched NO row in base ∪ appends are CARRIED FORWARD into
    *     the new generation's delete channel (a delete that arrived
    *     before its insert — the CDC delete-before-row ordering — must
    *     still kill the row when it lands after the compaction;
    *     without the carry, the fold would consume the tombstone with
    *     no effect and the later append would resurrect the key).
    *     Tombstones that DID remove rows are purged with the channel.
    *     The carried set is bounded by the store's never-matched
    *     delete traffic, never corpus-sized.
    *   - LWW stores ([[loadLww]]) pass `deleteKeys = Nil`: a later
    *     insert legitimately supersedes an earlier tombstone, so an
    *     unmatched tombstone must NOT outlive the fold (the arriving
    *     insert's batchId is above the watermark, hence newer).
    * `recordPurged` (requires `deleteKeys`) additionally appends the
    * folding tombstones' keys to a CUMULATIVE `purged.parquet` list
    * ([[purged]]) — the durable right-to-be-forgotten record a
    * from-source rebuild ([[graft.operators.AnnSuite.ivfPqRetrain]])
    * anti-joins so a completed purge survives retraining from a lake
    * frame that still carries the deleted rows. Append-only, bounded
    * by lifetime delete traffic.
    */
  def compact(spark: SparkSession, dir: String, scheme: Scheme,
      folded: => DataFrame, partitionCols: Seq[String],
      crashBeforeCommit: Boolean = false, retain: Int = 1,
      requireSegments: Boolean = true,
      beforeCommit: Int => Unit = _ => (),
      onRetire: Int => Unit = _ => (),
      sidecarPrefixes: Seq[String] = Nil,
      deleteKeys: Seq[String] = Nil,
      recordPurged: Boolean = false): Boolean = {
    require(retain >= 1, s"retain must be >= 1 (got $retain)")
    require(!recordPurged || deleteKeys.nonEmpty,
      "recordPurged requires deleteKeys (the tombstone key columns)")
    val lay = resolve(spark, dir, scheme)
    val fs = fileSystem(spark, dir)
    val appendsPath = new org.apache.hadoop.fs.Path(s"$dir/${lay.appends}")
    val deletesPath =
      new org.apache.hadoop.fs.Path(s"$dir/${scheme.deletesOf(lay.gen)}")
    if (requireSegments && !fs.exists(appendsPath) && !fs.exists(deletesPath))
      return false
    // the new watermark: every committed segment id — append AND
    // tombstone — folds into the base (tombstoned rows by omission:
    // `folded` is the reader view, which anti-joined them already)
    def segIds(p: org.apache.hadoop.fs.Path): Seq[Long] =
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("batch_id="))
        .flatMap(_.stripPrefix("batch_id=").toLongOption)
    val newFolded = (segIds(appendsPath) ++ segIds(deletesPath) :+ lay.folded).max
    val next = lay.gen + 1
    // 1. land the folded base under the NEXT generation's name
    //    (idempotent overwrite — a torn attempt just redoes)
    val w = folded.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(s"$dir/${scheme.baseOf(next)}")
    // 2. clear generation-<next> leftovers a TORN prior attempt (plain
    //    compact, retrain, or carry-forward) may have orphaned: the
    //    delete channel dir and every sidecar family's <next> version.
    //    Runs BEFORE beforeCommit/carry-forward so this run's own
    //    landings survive; committing the manifest below would
    //    otherwise make any stale orphan visible as generation state.
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/${scheme.deletesOf(next)}"), true)
    // ... including a torn recordPurged attempt's commit dir: purged
    //   entries become durable only when the generation commits, so a
    //   stale commit=<next> left by a prior torn run must not ride into
    //   THIS run's manifest (this run re-lands it below iff it also
    //   passes recordPurged — the invariant is structural, not
    //   dependent on callers always purging). An emptied parent is
    //   removed too: [[purged]] treats bare existence as "has entries".
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$dir/${scheme.purged0}/commit=$next"), true)
    locally {
      val pp = new org.apache.hadoop.fs.Path(s"$dir/${scheme.purged0}")
      if (fs.exists(pp) && fs.listStatus(pp).isEmpty) fs.delete(pp, true)
    }
    sidecarPrefixes.foreach { pre =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$pre$next.parquet"), true)
    }
    // 3. tombstone disposition (terminal-delete stores only — see doc)
    if (deleteKeys.nonEmpty && fs.exists(deletesPath)) {
      val keyCols = deleteKeys.map(org.apache.spark.sql.functions.col)
      val tombs = spark.read.parquet(deletesPath.toString)
        .select(keyCols: _*).distinct()
      val standing = {
        val b = spark.read.parquet(s"$dir/${lay.base}").select(keyCols: _*)
        if (fs.exists(appendsPath))
          b.unionByName(
            spark.read.parquet(appendsPath.toString).select(keyCols: _*))
        else b
      }
      val carried = tombs.join(standing, deleteKeys, "left_anti")
      if (carried.count() > 0)
        carried.write.mode("overwrite").parquet(
          s"$dir/${scheme.deletesOf(next)}/batch_id=$newFolded")
      if (recordPurged)
        tombs.write.mode("overwrite")
          .parquet(s"$dir/${scheme.purged0}/commit=$next")
    }
    beforeCommit(next)
    if (crashBeforeCommit) return false
    // 2. commit the generation (readers switch at their next resolve)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$dir/MANIFEST-$next"), true)
    try out.write(
      s"v2 ${scheme.baseOf(next)} ${scheme.appendsOf(next)} $newFolded\n"
        .getBytes("UTF-8"))
    finally out.close()
    // 3. retire every generation older than the newest `retain`
    //    previous ones — the retained generations keep a pre-commit
    //    reader's files on disk (and the manifest-fallback chain
    //    serviceable); the loop form also heals leftovers if `retain`
    //    shrank between calls
    for (g <- 0 to next - 1 - retain) {
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/${scheme.baseOf(g)}"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/${scheme.appendsOf(g)}"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/${scheme.deletesOf(g)}"), true)
      if (g > 0)
        fs.delete(new org.apache.hadoop.fs.Path(s"$dir/MANIFEST-$g"), true)
      onRetire(g)
    }
    true
  }

  /** Clear every segment, manifest, and versioned generation — a full
    * index rebuild resets the store to generation 0 (the fresh base
    * the caller is about to write). Prior segments must not leak into
    * reloads of the new build.
    */
  def reset(spark: SparkSession, dir: String, scheme: Scheme): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = fileSystem(spark, dir)
    if (!fs.exists(p)) return
    fs.listStatus(p).foreach { st =>
      val n = st.getPath.getName
      if (n == scheme.appends0 || n == scheme.deletes0 ||
        n == scheme.purged0 || n.startsWith("MANIFEST-") ||
        n.startsWith(scheme.vBase) || n.startsWith(scheme.vAppends) ||
        n.startsWith(scheme.vDeletes))
        fs.delete(st.getPath, true)
    }
  }
}
