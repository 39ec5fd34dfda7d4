package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // 475k synthetic ~300-char pairs, 32 partitions, pure leven cost
    val base = spark.range(475000).repartition(32)
      .withColumn("ta", expr("repeat(concat('word', CAST(id % 97 AS STRING), ' '), 40)"))
      .withColumn("tb", expr("repeat(concat('word', CAST((id+1) % 97 AS STRING), ' '), 40)"))
      .localCheckpoint()
    println("partitions: " + base.rdd.getNumPartitions)
    def time(label: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ => System.gc(); val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
      println(f"$label: ${ts.sorted.apply(1)}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame) = df.write.format("noop").mode("overwrite").save()
    time("baseline (no leven)")(noop(base.select(length(col("ta")).as("x"))))
    time("leven banded 30")(noop(base.select(levenshtein(col("ta"), col("tb"), 30).as("x"))))
    time("leven full")(noop(base.select(levenshtein(col("ta"), col("tb")).as("x"))))
    spark.stop()
  }
}
