package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic sf1 lake: tile the driver's sf0.1 tables `factor`
  * times, each replica a self-contained key universe — every PK and the
  * FKs that reference it shift by `replica * stride` (stride = source
  * max key + 1), so joins stay valid and result cardinalities scale
  * linearly. Content columns are perturbed per replica (letter-rotated
  * text, sign-flipped embedding dims, time-shifted events) so the
  * near-dup/ANN operators don't see 10 exact copies of every document —
  * cross-replica collisions would square the candidate volume and make
  * the scale curve measure a data artifact instead of the plan.
  * `region`/`nation` stay global dims: dimensions don't grow with fact
  * data, and keeping them 25-row preserves the broadcast-join shape the
  * plans are designed around.
  *
  * Purpose (VERDICT r7 §missing-2): the 2 MB → 17 MB curve never leaves
  * the page cache; the ~170 MB sf1 point makes the 100× growth ratios
  * meaningful. No RNG and no clock anywhere — byte-identical output for
  * a given source, so growth ratios are comparable across rounds.
  */
object TileUp {

  /** Marker written after all tables land; `ensure` keys off it so a
    * killed half-finished generation is redone, never trusted. The
    * marker CONTENT is a descriptor of (source, factor, per-file
    * size+mtime of the source lake): the driver regenerates
    * /root/testdata between rounds (it did — events.ts ns→µs), and a
    * lake tiled from the OLD source would silently skew every sf1
    * comparison, so a descriptor mismatch forces a re-tile.
    */
  private def marker(dst: String) = Paths.get(dst, "_TILEUP_OK")

  private val TableNames = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Bump when the tiling transform itself changes — a lake generated
    * by an older transform must not satisfy `ensure`.
    */
  private val GenVersion = 2

  private def descriptor(src: String, factor: Int): String = {
    val files = TableNames.map { n =>
      val f = new java.io.File(s"$src/$n.parquet")
      s"$n ${f.length} ${f.lastModified}"
    }
    (s"gen=$GenVersion src=$src factor=$factor" +: files).mkString("\n")
  }

  def ensure(spark: SparkSession, src: String, dst: String, factor: Int = 10): Boolean = {
    val want = descriptor(src, factor)
    val fresh = Files.exists(marker(dst)) &&
      new String(Files.readAllBytes(marker(dst)), "UTF-8") == want
    if (fresh) return true
    try { generate(spark, src, dst, factor); true }
    catch { case e: Throwable =>
      System.err.println(s"[tileup] generation failed: $e"); false
    }
  }

  def generate(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    Files.createDirectories(Paths.get(dst))
    Files.deleteIfExists(marker(dst))

    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c).cast("long"))).head.getLong(0)

    // strides: PK domain width per key family, shared with every FK site
    val cust = Tables.customer(spark, src)
    val supp = Tables.supplier(spark, src)
    val part = Tables.part(spark, src)
    val ord = Tables.orders(spark, src)
    val li = Tables.lineitem(spark, src)
    val ev = Tables.events(spark, src)
    val doc = Tables.documents(spark, src)
    val emb = Tables.embeddings(spark, src)
    val sCust = maxOf(cust, "c_custkey") + 1
    val sSupp = maxOf(supp, "s_suppkey") + 1
    val sPart = maxOf(part, "p_partkey") + 1
    val sOrd = maxOf(ord, "o_orderkey") + 1
    val sEvent = maxOf(ev, "event_id") + 1
    val sUser = maxOf(ev, "user_id") + 1
    // doc_id and vec_id share one stride so any id correspondence between
    // the two tables survives tiling
    val sDoc = math.max(maxOf(doc, "doc_id"), maxOf(emb, "vec_id")) + 1

    /** Union of per-replica frames; `f(i)` must be deterministic in i. */
    def tiled(f: Int => DataFrame): DataFrame =
      (0 until factor).map(f).reduce(_ unionByName _)

    def bump(c: String, stride: Long, i: Int): Column =
      (col(c) + lit(stride * i)).cast("long").as(c)

    def write(df: DataFrame, name: String): Unit = {
      // a handful of files per table: enough scan splits to parallelize,
      // few enough that the lake stays footer-cheap
      df.repartition(8).write.mode("overwrite").parquet(s"$dst/$name.parquet")
      System.err.println(s"[tileup] wrote $name")
    }

    // global dims: copied, not tiled
    write(Tables.region(spark, src), "region")
    write(Tables.nation(spark, src), "nation")

    write(tiled(i => cust.select(bump("c_custkey", sCust, i), col("c_name"),
      col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))), "customer")

    write(tiled(i => supp.select((bump("s_suppkey", sSupp, i) +:
      supp.columns.filter(_ != "s_suppkey").map(col).toSeq): _*)), "supplier")

    write(tiled(i => part.select((bump("p_partkey", sPart, i) +:
      part.columns.filter(_ != "p_partkey").map(col).toSeq): _*)), "part")

    write(tiled(i => ord.select(bump("o_orderkey", sOrd, i), bump("o_custkey", sCust, i),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority"))), "orders")

    write(tiled(i => li.select((Seq(bump("l_orderkey", sOrd, i),
      bump("l_partkey", sPart, i), bump("l_suppkey", sSupp, i)) ++
      li.columns.filterNot(Set("l_orderkey", "l_partkey", "l_suppkey")).map(col)): _*)),
      "lineitem")

    // events: fresh users + ids per replica, time domain extended by a
    // 397-day shift — per-window/per-session row counts stay constant
    // while the window count scales, which is how a 10× bigger event log
    // actually grows
    write(tiled(i => ev.select(bump("event_id", sEvent, i),
      (col("ts") + expr(s"INTERVAL ${397 * i} DAYS")).as("ts"),
      bump("user_id", sUser, i), col("event_type"), col("value"), col("props"))),
      "events")

    // documents: rotate a high-frequency letter class (+ digits, so
    // numeric-only texts perturb too) per replica — cheap,
    // length-preserving, and changes nearly every shingle so no replica
    // is a near-dup of another. A text containing NONE of these
    // characters would still tile identically; TileUpSpec's
    // distinct-texts assertion is the canary for such a corpus.
    val alpha = "etaoinshrdl0123456789"
    def rot(i: Int): String = alpha.drop(i % alpha.length) + alpha.take(i % alpha.length)
    write(tiled(i => doc.select(bump("doc_id", sDoc, i),
      (if (i == 0) col("text") else translate(col("text"), alpha, rot(i))).as("text"),
      col("lang"), col("source"), col("n_chars"))), "documents")

    // embeddings: flip one dim class (j ≡ i mod factor, i ≥ 1) per
    // replica — norm-preserving, and any two replicas differ in 2/factor
    // of their dims so cross-replica cosine falls well below near-dup
    // thresholds
    write(tiled(i => emb.select(bump("vec_id", sDoc, i),
      (if (i == 0) col("embedding")
       else transform(col("embedding"),
         (x, j) => when(j % factor === i, -x).otherwise(x))).as("embedding"),
      col("label"))), "embeddings")

    Files.write(marker(dst), descriptor(src, factor).getBytes("UTF-8"))
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/root/repo/data/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, dst, factor)
    spark.stop()
  }
}
