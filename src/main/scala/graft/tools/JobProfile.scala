package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-JOB wall-time attribution for one registry query —
  * which driver ACTIONS (parquet writes, localCheckpoints, counts,
  * broadcast builds, the final noop sink) a query's wall is made of,
  * keyed by the action's call site. The bench's per-query wall is a sum
  * of jobs; this splits it so optimization targets the dominant ones
  * instead of guessing. Usage:
  *
  *   runMain graft.tools.JobProfile <sfDir> <query> [runs]
  */
object JobProfile {
  private final class JobMeter extends SparkListener {
    case class J(id: Int, site: String, t0: Long, var t1: Long = -1L)
    val jobs = mutable.LinkedHashMap.empty[Int, J]
    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      // the result stage's name IS the triggering action's call site
      val site = e.stageInfos.lastOption.map(_.name.takeWhile(_ != '(').trim)
        .getOrElse("?")
      jobs(e.jobId) = J(e.jobId, site, System.nanoTime())
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      jobs.get(e.jobId).foreach(_.t1 = System.nanoTime())
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("recon_index")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    names.foreach { name =>
      def run(): Unit = graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

      run() // warm: codegen + scratch-layout steady state
      val meter = new JobMeter
      spark.sparkContext.addSparkListener(meter)
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      run()
      val wall = (System.nanoTime() - t0) / 1e9
      // drain so the last job's end event is folded in
      org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      spark.sparkContext.removeSparkListener(meter)
      println(f"===== $name%s: wall $wall%.2f s, ${meter.jobs.size}%d jobs =====")
      val done = meter.jobs.values.toSeq.filter(_.t1 > 0)
      val bySite = done.groupBy(_.site).map { case (s, js) =>
        (s, js.size, js.map(j => (j.t1 - j.t0) / 1e9).sum)
      }.toSeq.sortBy(-_._3)
      bySite.take(15).foreach { case (site, n, sec) =>
        println(f"$sec%8.3f s  x$n%-3d  $site%s") }
      val jobSum = done.map(j => (j.t1 - j.t0) / 1e9).sum
      println(f"job-covered: $jobSum%.2f s of $wall%.2f s (gap = driver planning/IO)")
    }
    spark.stop()
  }
}
