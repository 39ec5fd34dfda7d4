package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.AnnSuite
import graft.sources.Tables

/** Ops measurement behind `bench/drift_curve.json` — the quantized
  * when-to-retrain gate at MEASUREMENT size, on a corpus that
  * GENUINELY drifted. The registry entries (`ann_ivfpq_drift`,
  * `ann_ivfpq_drift_shifted`) are hash-checked but oracle-sized
  * (5 queries, recall@3), where per-codebook noise exceeds the rate
  * deltas; this tool runs the SAME deterministic gate kernel
  * ([[AnnSuite.ivfPqDriftGate]]) over `nq` queries at recall@`topK`
  * (default 100 × 10 = 1000 truth rows) twice:
  *
  *   - `unshifted` — the corpus as-is (the held %7=3 slice comes from
  *     the SAME distribution the base training saw): retrained ≈
  *     stale, the honest no-drift reading;
  *   - `shifted`   — the held slice displaced +0.5 on every dimension
  *     ([[AnnSuite.driftedCorpus]]), queries drawn FROM the drifted
  *     slice: the reading where retraining measurably wins, i.e. the
  *     committed number that justifies pulling the ivfPqRetrain
  *     trigger.
  *
  * Both runs use the same query ids (the first `nq` of the %7=3
  * slice), so the two pairs differ only in the drift. Usage:
  *
  *   runMain graft.tools.DriftCurve <sfDir> [nQueries] [topK]
  *
  * Prints one JSON line with both (stale, retrained) pairs.
  */
object DriftCurve {
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
    // the first nq ids of the held slice: 3, 10, ..., 7*nq - 4
    val qPred = col("vec_id") % 7 === 3 && col("vec_id") < lit(7L * nq)

    def gateJson(corpus: DataFrame): String =
      AnnSuite.ivfPqDriftGate(corpus, qPred, topK).collect().map { r =>
        s""""${r.getString(0)}":{"n_truth":${r.getLong(1)},""" +
          s""""hits":${r.getLong(2)},"recall_e6":${r.getLong(3)}}"""
      }.mkString("{", ",", "}")

    val unshifted = gateJson(e)
    val shifted = gateJson(AnnSuite.driftedCorpus(e))
    println(s"""{"sf_dir":"$dir","n_queries":$nq,"top_k":$topK,""" +
      s""""queries":"first $nq ids of the vec_id % 7 = 3 slice",""" +
      s""""unshifted":$unshifted,"shifted":$shifted}""")
    spark.stop()
  }
}
