package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Spill-awareness evidence: at 100 TB, per-partition working sets WILL
  * exceed executor buffers, and the engine must degrade to disk — same
  * answer, slower — rather than OOM or corrupt. The local lakes all fit
  * in memory (sf10's spill map is expected empty on a 128 GiB host), so
  * this spec forces the spill path deterministically by shrinking the
  * operator buffer thresholds to a few rows and proves (a) the spill
  * actually happened (task-metric spill bytes > 0 — the same counters
  * Bench publishes) and (b) the result is row-identical to the
  * in-memory run.
  */
class SpillSpec extends SparkSpecBase {

  private final class SpillMeter extends SparkListener {
    val spill = new LongAdder
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null && e.taskInfo != null && e.taskInfo.successful)
        spill.add(m.memoryBytesSpilled + m.diskBytesSpilled)
    }
  }

  /** A window heavy enough to overflow a tiny buffer: rank every event
    * within its user's history (sf0.001: ~15k rows over 150 users).
    */
  private def ranked() = Tables.events(spark, sf)
    .select(col("event_id"), col("user_id"), col("ts"))
    .withColumn("rk", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")))
    .orderBy("user_id", "rk")

  test("window operator spills under a tiny buffer and stays row-identical") {
    val expected = ranked().collect()
    val meter = new SpillMeter
    spark.sparkContext.addSparkListener(meter)
    try withConfs(
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "16",
      "spark.sql.windowExec.buffer.spill.threshold" -> "16") {
      val spilled = ranked().collect()
      assert(org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext),
        "listener bus failed to drain — spill metrics not attributable")
      assert(meter.spill.sum > 0L,
        "buffer threshold of 16 rows did not force a spill — the spec is not testing the spill path")
      assert(spilled.map(_.toString).toSeq === expected.map(_.toString).toSeq)
    } finally spark.sparkContext.removeSparkListener(meter)
  }

  test("sort-merge join spills under a tiny buffer and stays row-identical") {
    def joined() = {
      val ev = Tables.events(spark, sf).select(col("user_id"), col("event_id"))
      // self-join on user_id: every user's events match each other, so
      // the per-key match buffer (events-per-user ≈ 100) overflows 16
      ev.join(ev.select(col("user_id"), col("event_id").as("other_id")), "user_id")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"), sum(col("other_id")).as("s"))
        .orderBy("user_id")
    }
    val expected = joined().collect()
    val meter = new SpillMeter
    spark.sparkContext.addSparkListener(meter)
    try withConfs(
      // force SMJ (no broadcast) and shrink its buffered-match buffer
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "16",
      "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "16") {
      val spilled = joined().collect()
      assert(org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext),
        "listener bus failed to drain — spill metrics not attributable")
      assert(meter.spill.sum > 0L,
        "join buffer threshold of 16 rows did not force a spill")
      assert(spilled.map(_.toString).toSeq === expected.map(_.toString).toSeq)
    } finally spark.sparkContext.removeSparkListener(meter)
  }
}
