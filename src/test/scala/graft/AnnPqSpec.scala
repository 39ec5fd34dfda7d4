package graft

import org.apache.spark.sql.functions._

/** Product-quantization search (AnnSuite.pqSearch). The registry entry
  * is hash-checked end to end against the DuckDB mirror; this spec
  * proves the BEHAVIOR on a corpus with known structure — ADC distances
  * must rank same-cluster members ahead of other clusters — plus the
  * self-exclusion and determinism contracts.
  */
class AnnPqSpec extends SparkSpecBase {

  // 3 well-separated clusters of 8 vectors each (64-dim): member m of
  // cluster c sits at base level c*10 with a tiny deterministic jitter,
  // so every within-cluster distance is orders below any cross-cluster
  // one and PQ's codebook (ksub=4 per subspace) separates them easily.
  private def corpus = {
    val s = spark
    import s.implicits._
    val rows = for {
      c <- 0 until 3
      m <- 0 until 8
    } yield (c.toLong * 8 + m,
      Array.tabulate(64)(i => (c * 10.0 + 0.01 * m + 0.001 * (i % 7)).toFloat))
    rows.toDF("vec_id", "embedding")
  }

  test("ADC top-k of a query is exactly its own cluster's other members") {
    val q = corpus.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val got = graft.operators.AnnSuite.pqSearch(corpus, q,
      m = 8, dsub = 8, ksub = 4, topK = 7).collect()
    assert(got.length === 7)
    // the 7 nearest by ADC are the 7 other cluster-0 members (ids 1..7)
    assert(got.map(_.getLong(1)).sorted.toSeq === (1L to 7L))
    // ranks are 1..7 with adist non-decreasing
    assert(got.map(_.getLong(3)).toSeq === (1L to 7L))
    assert(got.map(_.getLong(2)).toSeq === got.map(_.getLong(2)).sorted.toSeq)
    // the relative property PQ must preserve: every within-cluster ADC
    // distance beats every cross-cluster one (rank 8+ are other
    // clusters, strictly farther than the worst cluster mate)
    val all = graft.operators.AnnSuite.pqSearch(corpus, q,
      m = 8, dsub = 8, ksub = 4, topK = 23).collect()
    val (own, cross) = all.partition(_.getLong(1) <= 7L)
    assert(own.map(_.getLong(2)).max < cross.map(_.getLong(2)).min)
  }

  test("the query never returns itself and the search is deterministic") {
    val q = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def run() = graft.operators.AnnSuite.pqSearch(corpus, q,
      m = 8, dsub = 8, ksub = 4, topK = 5)
      .orderBy("query_id", "rk").collect()
    val a = run()
    assert(a.forall(r => r.getLong(0) != r.getLong(1)),
      "a query must not rank itself")
    assert(a.map(_.toString).toSeq === run().map(_.toString).toSeq,
      "rebuilt codebook + codes must be bit-identical")
  }
}
