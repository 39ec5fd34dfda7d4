package graft

import org.apache.spark.sql.functions._

/** AQE's automatic skew-join split, demonstrated end-to-end — the
  * companion evidence to `q_skew_join_salted`'s manual salting
  * (graft.operators.ExtendedSuite): on a plain shuffled join Spark's
  * adaptive planner detects a straggler partition from the ACTUAL map
  * output sizes and splits it into advisory-sized reads, marking the
  * join `skew=true` in the final adaptive plan.
  *
  * When to rely on which (the SURVEY §5 guidance this spec pins):
  * AQE covers sort-merge/shuffled-hash JOINS with no extra code —
  * the default posture at 100 TB. Manual salting remains necessary
  * where AQE can't reach: skewed AGGREGATIONS (no skew-split exists
  * for partial aggregates) and joins whose downstream consumers
  * require the unsplit partitioning.
  *
  * Thresholds are lowered to catch the fixture's ~MB-scale straggler —
  * the DETECTION RULE (partition > threshold AND > factor × median) is
  * what's under test, and it is scale-free; production leaves the
  * 256 MB default in place.
  */
class AqeSkewJoinSpec extends SparkSpecBase with WithSessionConfs {
  def sessionConfs: Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // scale the detector down to the fixture: flag a partition past
    // 64 KB and 2× the median, split into ~32 KB reads
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
    // both sides must stay shuffled: a broadcast join has no skewed
    // shuffle partition to split
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

  /** ~95% of fact rows share key 0 (incompressible md5 payload so map
    * output sizes reflect the row count); dim side is uniform.
    */
  private def skewedJoin() = {
    val fact = spark.range(0, 120000).select(
      when(col("id") < 114000, lit(0L)).otherwise(col("id") % 64).as("k"),
      md5(col("id").cast("string")).as("payload"))
    val dim = spark.range(0, 64).select(col("id").as("k"), (col("id") * 7).as("v"))
    fact.join(dim, "k").select(sum(length(col("payload"))).as("s"), sum(col("v")).as("sv"))
  }

  test("a hot-keyed shuffled join triggers AQE's skew split (skew=true)") {
    val q = skewedJoin()
    val rows = q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"expected the final adaptive plan to mark the join skew=true:\n$plan")
    // every fact row is 32 md5 chars and joins exactly one dim row
    assert(rows.head.getLong(0) === 120000L * 32)
  }

  test("the skew split changes the plan, not the answer") {
    val withSplit = skewedJoin().collect()
    withConfs("spark.sql.adaptive.skewJoin.enabled" -> "false") {
      val q = skewedJoin()
      val without = q.collect()
      assert(!q.queryExecution.executedPlan.toString.contains("skew=true"))
      assert(withSplit.map(_.toString).toSeq === without.map(_.toString).toSeq)
    }
  }
}
