package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.AnnSuite
import graft.sources.Tables

/** Ops measurement behind `bench/pq_sampled_curve.json` — the
  * training-rate → recall curve and the quantized drift gate at
  * MEASUREMENT size. The registry entries (`ann_pq_sampled_recall`,
  * `ann_ivfpq_drift`) are hash-checked but sized for the oracle
  * (5 queries, recall@3 = 15 truth rows), and at that sample size the
  * rate ordering drowns in per-codebook noise (full training can read
  * "worse" than a 1/256 sample). This tool runs the SAME deterministic
  * kernels over `nq` queries at recall@`topK` (default 100 × 10 =
  * 1000 truth rows) so the committed curve measures the codebook, not
  * the query draw. Usage:
  *
  *   runMain graft.tools.PqCurve <sfDir> [nQueries] [topK]
  *
  * Prints one JSON line: per-rate training rows + hits + recall_e6,
  * plus the stale-vs-retrained IVFADC pair at the same size.
  */
object PqCurve {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nq = args.lift(1).map(_.toInt).getOrElse(100)
    val topK = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.graft.Bridge.register(spark)

    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val q = e.filter(col("vec_id") < nq)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cand_id"), col("embedding").as("ce"))
    // exact L2 truth once, shared by every leg (the drift entries' form)
    val truth = graft.api.Graft.rankedByGroup(
        c.join(broadcast(q), col("query_id") =!= col("cand_id"))
          .withColumn("d_e6", floor(expr(
            """aggregate(zip_with(qe, ce,
              |  (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
              |          * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
              |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)
            * 1e6 + 0.5).cast("long"))
          .select(col("query_id"), col("d_e6"), col("cand_id")),
        Seq("query_id"), Seq(col("d_e6").asc, col("cand_id")))
      .filter(col("rn") <= topK)
      .select("query_id", "cand_id")
      .localCheckpoint()
    val nTruth = truth.count()
    val queriesDf = e.filter(col("vec_id") < nq)
      .select(col("vec_id").as("query_id"), col("embedding"))

    def recallE6(hits: Long): Long =
      math.floor(hits.toDouble * 1e6 / nTruth + 0.5).toLong

    val rates = Seq(1, 2, 16, 256).map { mod =>
      val trainRows =
        if (mod <= 1) e.count()
        else e.filter(graft.functions.Portable
          .rowHash60(col("vec_id").cast("string")) % mod === 0).count()
      val book = AnnSuite.pqTrain(e, m = 8, dsub = 8, ksub = 16, sampleMod = mod)
      val got = AnnSuite.pqQuery(
          AnnSuite.PqIndex(book, AnnSuite.pqEncode(e, book, 8, 8), 8, 8),
          queriesDf, topK)
        .select("query_id", "cand_id")
      val hits = truth.join(got, Seq("query_id", "cand_id")).count()
      (mod, trainRows, hits)
    }

    // the quantized drift pair at measurement size (ann_ivfpq_drift's
    // two legs: frozen base-trained parameters vs a fresh full build)
    val sIdx = AnnSuite.ivfPqBuild(e.filter(col("vec_id") % 7 =!= 3),
      "vec_id", "embedding", AnnSuite.IvfK, m = 8, dsub = 8, ksub = 16)
    val sCents = sIdx.centroids.localCheckpoint()
    val assignedFull = AnnSuite.kmeansAssign(e, sCents)
      .select(col("vec_id"), col("cid").as("cell"), col("embedding"))
    val stale = AnnSuite.IvfPqIndex(sCents,
      AnnSuite.PqIndex(sIdx.pq.book,
        AnnSuite.pqEncode(assignedFull, sIdx.pq.book, 8, 8, carry = Seq("cell")),
        8, 8))
    val fresh = AnnSuite.ivfPqBuild(e, "vec_id", "embedding", AnnSuite.IvfK,
      m = 8, dsub = 8, ksub = 16)
    val drift = Seq("stale" -> stale, "retrained" -> fresh).map {
      case (variant, idx) =>
        val got = AnnSuite.ivfPqQuery(idx, queriesDf, "query_id", "embedding",
            AnnSuite.IvfNProbe, topK)
          .select("query_id", "cand_id")
        variant -> truth.join(got, Seq("query_id", "cand_id")).count()
    }

    val ratesJson = rates.map { case (mod, tr, hits) =>
      s"""{"sample_mod":$mod,"train_rows":$tr,"hits":$hits,"recall_e6":${recallE6(hits)}}"""
    }.mkString("[", ",", "]")
    val driftJson = drift.map { case (v, hits) =>
      s""""$v":{"hits":$hits,"recall_e6":${recallE6(hits)}}"""
    }.mkString("{", ",", "}")
    println(s"""{"sf_dir":"$dir","n_queries":$nq,"top_k":$topK,""" +
      s""""n_truth":$nTruth,"rates":$ratesJson,"ivfpq_drift":$driftJson}""")
    spark.stop()
  }
}
