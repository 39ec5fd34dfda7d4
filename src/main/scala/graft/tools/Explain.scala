package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print executed plans (and optionally re-run timings) for
  * selected queries. Usage: runMain graft.tools.Explain <sfDir> <name>...
  * Pass `--time` to run each query twice and print wall times.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val time = args.contains("--time")
    val rest = args.filterNot(_ == "--time")
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (rest.length > 1) rest.drop(1).toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      if (time) {
        (1 to 2).foreach { i =>
          val t0 = System.nanoTime()
          df.count()
          println(s"  run$i: ${(System.nanoTime() - t0) / 1e9}s")
        }
      } else {
        println(df.queryExecution.executedPlan.toString.linesIterator
          .map(_.take(160)).take(50).mkString("\n"))
      }
    }
    spark.stop()
  }
}
