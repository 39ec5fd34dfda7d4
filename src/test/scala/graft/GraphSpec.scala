package graft

import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpecBase {

  test("graph_pagerank: exact match against a driver-side power iteration") {
    val rows = graft.operators.GraphSuite.queries("graph_pagerank")(spark, sf).collect()
    assert(rows.nonEmpty)

    // rebuild the symmetrized edge list on the driver (sf0.001 is tiny)
    val base = graft.sources.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey")
      .join(graft.sources.Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = base ++ base.map { case (a, b) => (b, a) }
    val outdeg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap

    var rank: Map[Long, Long] = outdeg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to graft.operators.GraphSuite.PrIters) {
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (src, _) => rank(src) / outdeg(src) }.sum).toMap
      rank = outdeg.keys.map(n => n -> (150000L + 85L * contrib(n) / 100L)).toMap
    }

    assert(rows.length == rank.size, "one output row per graph node")
    rows.foreach { r =>
      val node = r.getAs[Long]("entity_id") * 2 +
        (if (r.getAs[String]("node_type") == "supplier") 1 else 0)
      assert(r.getAs[Long]("rank_ppm") == rank(node),
        s"node $node: got ${r.getAs[Long]("rank_ppm")}, expected ${rank(node)}")
      assert(r.getAs[Long]("rank_ppm") >= 150000L, "teleport term is a floor")
    }
    // output is rank-descending with a deterministic tiebreak
    val ranks = rows.map(_.getAs[Long]("rank_ppm")).toSeq
    assert(ranks == ranks.sorted.reverse)
  }
}
