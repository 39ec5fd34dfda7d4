package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Queries run CONCURRENTLY on a small fixed pool (guide §2.6: actions
  * are sequential only because driver code calls them sequentially; one
  * query's jobs back-fill executors idled by another's trigger waits,
  * broadcast builds and driver-side planning — the streaming twins in
  * particular spend most of their wall waiting on micro-batch
  * machinery, not CPU). Every query remains self-contained (own scratch
  * dirs, own streaming checkpoint/queryName, deterministic output), so
  * results are unchanged — the one exception is entries sharing an
  * on-disk fixture, which are chained below.
  */
object Verify {
  /** Entries that rebuild the SAME stable fixture dirs (two writers
    * racing on one SegmentStore would corrupt it): run each group's
    * members sequentially on one pool thread. recon_index and
    * recon_index_report both (re)build reconIndexFixture's two stores
    * (recon_index_ivf / recon_index_ivfpq). Every other entry's stable
    * scratch paths are prefixed with its own name (audited r17).
    */
  private val ConflictGroups = Seq(Seq("recon_index", "recon_index_report"))

  def main(args: Array[String]): Unit = {
    // optional 3rd+ args: restrict to the named queries (local iteration
    // aid; the driver always invokes with exactly two)
    val (sfDir, outDir, only) = (args(0), args(1), args.drop(2).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // hoist the per-entry session setup: register the native functions
    // once here, so the 59 in-entry Bridge.register calls become no-ops
    // (idempotence guard in Bridge) instead of 59 × 11 re-registrations
    org.apache.spark.sql.graft.Bridge.register(spark)
    new java.io.File(outDir).mkdirs()

    def runOne(name: String): Unit = {
      try SparkEntry.queries(name)(spark, sfDir).coalesce(1).write
        .mode("overwrite").parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // pipeline exit: drop any persists the query registered so cached
      // intermediates don't accumulate across the 230-query run (main
      // code holds no persists — localCheckpoint blocks are unaffected —
      // so a concurrent clear can only force a recompute, never change
      // a result)
      spark.catalog.clearCache()
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(name => only.isEmpty || only(name))
    val chained = ConflictGroups.flatten.toSet
    // one unit = what a single pool thread runs in order; longest work
    // first (streaming twins and the fixture-heavy chains) so the pool's
    // tail is short queries, not a 7 s twin started last
    val units: Seq[Seq[String]] =
      (ConflictGroups.map(_.filter(names.contains)).filter(_.nonEmpty) ++
        names.filterNot(chained).map(Seq(_)))
        .sortBy { u =>
          val n = u.head
          if (u.length > 1 || n.startsWith("stream_") ||
            n.startsWith("cdc_stream") || n.startsWith("ann_") ||
            n.startsWith("recon_index")) 0 else 1
        }
    // default 8 measured best at sf0.01 (316 s sequential → 136 s at 4
    // → 111 s at 8 → 127 s at 12, same 228/228 oracle PASS); override
    // with SPARK_GRAFT_VERIFY_PAR, 1 = the old sequential loop
    val par = sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "8").toInt.max(1)
    if (par == 1 || units.length <= 1) units.foreach(_.foreach(runOne))
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(par,
        new java.util.concurrent.ThreadFactory {
          private val n = new java.util.concurrent.atomic.AtomicInteger
          def newThread(r: Runnable): Thread = {
            val t = new Thread(r, s"verify-${n.incrementAndGet()}")
            t.setDaemon(true); t
          }
        })
      try units.map { u =>
        pool.submit(new Runnable { def run(): Unit = u.foreach(runOne) })
      }.foreach(_.get()) // runOne never throws; .get() surfaces pool errors
      finally pool.shutdown()
    }
    // LSH hot-bucket diagnostic: the Spark-side gate caps buckets at
    // MaxBucket while the oracles run uncapped — surface the observed
    // occupancy at THIS scale factor so a corpus that crosses the cap
    // fails with a clear line here, not an opaque driver hash mismatch.
    try graft.operators.DedupSuite.bucketDiagnostics(spark, sfDir).foreach {
      case (fam, n) =>
        val cap = graft.operators.DedupSuite.MaxBucket
        val flag = if (n > cap)
          " EXCEEDS CAP — gated dedup operators will diverge from their uncapped oracles"
        else ""
        System.err.println(s"[verify] max_bucket $fam=$n cap=$cap$flag")
    } catch { case e: Throwable =>
      System.err.println(s"[verify] bucket diagnostics failed: ${e.getMessage}")
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
