package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2 — iterative graph analytics over relationship edges derived from
  * the lake (reference analog: the reconciliation toolkit's dependency
  * ordering walks a table-relationship graph driver-side
  * (parallel/reconciler.py); graft generalizes to data-scale graphs —
  * entity-importance ranking over the customer–supplier network).
  *
  * PageRank is THE canary for iterative workloads on Spark: the naive
  * version rebuilds the whole plan each iteration and shuffles the edge
  * list K times. The shape here is the scale-correct one:
  *   - the (src, dst, outdeg) contribution table is built ONCE,
  *     pre-partitioned on src, and localCheckpoint'd — iterations reuse
  *     its partitioning; the edge list never re-shuffles;
  *   - each iteration shuffles only the rank table (|nodes| rows of two
  *     BIGINTs), joins it to the static edges on the co-partitioned key,
  *     and aggregates contributions by dst with map-side combine;
  *   - per-iteration localCheckpoint truncates lineage AND logical plan
  *     so planning stays O(1) in K (same discipline as dedup_cluster).
  *
  * Arithmetic is exact-integer ppm so both engines agree bit-for-bit:
  * ranks start at 1 000 000 (i.e. rank×N in ppm), and one step is
  *   r'(n) = 150000 + (85 · Σ_incoming (r(src) div outdeg(src))) div 100
  * — floor division at every stage, no doubles anywhere. The symmetrized
  * graph has no dangling nodes (every node has outdeg ≥ 1), so the
  * damping redistribution term needs no special case. Products stay far
  * under 2^60: a hub with 10⁹ in-edges sums to ~10¹⁵ ppm before the ×85.
  */
object GraphSuite {

  /** Fixed iteration count — keeps the DuckDB oracle unrollable and the
    * result deterministic; convergence quality is a spec concern.
    */
  private[graft] val PrIters = 3

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> { (s, d) =>
      // Node ids pack the bipartite namespaces: customer c → 2c,
      // supplier s → 2s+1. Edge (cust, supp) exists when some lineitem
      // of the customer's order names the supplier; symmetrized so rank
      // flows both ways.
      val base = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      // sym is consumed by TWO actions below (the deg checkpoint and
      // the edges checkpoint) and, un-materialized, ALSO re-derived by
      // iteration 1 through the rank table's lineage — i.e. the heavy
      // fixture (orders ⋈ lineitem → distinct → union) ran twice: once
      // inside the edges job (its two sym subtrees dedup via exchange
      // reuse) and once more when iteration 1 first touched ranks (the
      // r16 wave-1 defect class: a second full fact-table pass at any
      // scale). Checkpointing sym runs it exactly once; the frame is
      // the same size class as the edges checkpoint two lines down,
      // which the design already materializes.
      val sym = base.unionByName(base.select(col("b").as("a"), col("a").as("b")))
        .select(col("a").as("src"), col("b").as("dst"))
        .localCheckpoint()
      // Static per-iteration join input: (src, dst, outdeg of src),
      // partitioned on the join key once. localCheckpoint is eager, so
      // the shuffles behind it run exactly once. deg (|nodes| rows, the
      // rank tables' size class) checkpoints too: it feeds both the
      // edges join and iteration 1's initial rank table.
      val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg"))
        .localCheckpoint()
      val edges = sym
        .join(deg.withColumnRenamed("node", "src"), "src")
        .repartition(col("src"))
        .localCheckpoint()
      var ranks = deg.select(col("node"), lit(1000000L).as("r"))
      for (_ <- 1 to PrIters) {
        ranks = edges
          .join(ranks.withColumnRenamed("node", "src"), "src")
          .groupBy(col("dst").as("node"))
          .agg(sum(expr("r div outdeg")).as("contrib"))
          .select(col("node"),
            expr("150000 + (85 * contrib) div 100").as("r"))
          .localCheckpoint()
      }
      ranks
        .select(
          when(col("node") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
            .as("node_type"),
          expr("node div 2").as("entity_id"),
          col("r").as("rank_ppm"))
        .orderBy(desc("rank_ppm"), col("node_type"), col("entity_id"))
    }
  )

  /** The same three iterations unrolled as CTEs. Every incoming
    * contribution re-derives src's outdeg via a join (no correlated
    * state); the symmetrized graph guarantees each node appears, so the
    * inner joins are total.
    */
  def oracles: Map[String, String] = Map(
    "graph_pagerank" -> {
      def step(prev: String, out: String): String =
        s"""$out AS (
           |  SELECT d.node,
           |    CAST(150000 + (85 * CAST(SUM(r.r // sd.outdeg) AS BIGINT)) // 100
           |         AS BIGINT) AS r
           |  FROM deg d
           |  JOIN edges e ON e.dst = d.node
           |  JOIN deg sd ON sd.node = e.src
           |  JOIN $prev r ON r.node = e.src
           |  GROUP BY d.node)""".stripMargin
      s"""WITH eb AS (
         |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |edges AS (SELECT a AS src, b AS dst FROM eb
         |          UNION ALL SELECT b AS src, a AS dst FROM eb),
         |deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg
         |        FROM edges GROUP BY src),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM deg),
         |${step("r0", "r1")},
         |${step("r1", "r2")},
         |${step("r2", "r3")}
         |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
         |    AS node_type,
         |  CAST(node // 2 AS BIGINT) AS entity_id, r AS rank_ppm
         |FROM r3
         |ORDER BY rank_ppm DESC, node_type, entity_id""".stripMargin
    }
  )
}
