package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Component profile for text_tfidf_topterms (the r10 punct_count
  * method, SURVEY §7(15): measure the stages BEFORE optimizing — the
  * registry's single wall number can't say whether the cost is the
  * (doc, term) explode shuffle, the checkpoint materialization, the
  * df aggregate, or the per-doc collect_list rollup). Stages mirror
  * graft.operators.TextSuite's registry entry exactly; each runs
  * twice (cache-cold) and prints both walls.
  *
  * Usage: runMain graft.tools.TfidfProfile [lakeDir]   (default sf10 tile)
  */
object TfidfProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/data/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      (1 to 2).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f
        println(f"$name%-28s run$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    val docs = graft.sources.Tables.documents(spark, dir)

    // stage 1: corpus scan + split/explode + (doc, term) count shuffle,
    // materialized but NOT checkpointed
    def tfPlan = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    time("tf_build(noop)") { noop(tfPlan) }

    // stage 2: the same plan through the eager localCheckpoint the
    // registry entry uses (adds block serialization + storage)
    var tfCp = tfPlan.localCheckpoint()
    time("tf_localCheckpoint") { tfCp.unpersist(true); tfCp = tfPlan.localCheckpoint() }

    // stage 3: document-frequency aggregate over the checkpointed tf
    time("dfreq(agg over cp)") { noop(tfCp.groupBy(col("w")).agg(count(lit(1)).as("df"))) }

    // stage 4: broadcast join + score + per-doc collect_list top-3
    // rollup + posexplode + final sort — everything downstream of tf
    val n = docs.agg(count(lit(1)).as("n_docs"))
    def downstream(tf: org.apache.spark.sql.DataFrame) = {
      val dfreq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      tf.join(broadcast(dfreq), "w")
        .crossJoin(broadcast(n))
        .withColumn("score", expr("(tf * n_docs * 1000000L) div df"))
        .groupBy(col("doc_id"))
        .agg(slice(array_sort(collect_list(struct(
          (-col("score")).as("ns"), col("w"), col("tf"), col("df"),
          col("score")))), 1, 3).as("top"))
        .select(col("doc_id"), posexplode(col("top")))
        .select(col("doc_id"), (col("pos") + 1).as("rk"),
          col("col.w").as("term"), col("col.tf").as("tf"),
          col("col.df").as("df"), col("col.score").as("score"))
        .orderBy("doc_id", "rk")
    }
    time("downstream(join+rollup)") { noop(downstream(tfCp)) }

    // alternative tf layout: repartition DOCS by doc_id before the
    // explode — HashPartitioning(doc_id) satisfies ClusteredDistribution
    // for BOTH the (doc_id, w) count aggregate AND the per-doc rollup,
    // so the (doc,term)-level pair shuffles disappear; the only pair
    // shuffle left is the vocabulary-sized df aggregate
    def tfPlan2 = docs.repartition(col("doc_id"))
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    time("tf_build2(doc-part)") { noop(tfPlan2) }
    val tfCp2 = tfPlan2.localCheckpoint()
    val down2 = downstream(tfCp2)
    time("downstream2(no pair shuffle)") { noop(down2) }
    println("downstream2 exchanges: " + down2.queryExecution.executedPlan
      .toString.linesIterator.count(_.contains("Exchange hashpartitioning")))
    println(down2.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Aggregate") ||
        l.contains("ExistingRDD") || l.contains("AQEShuffleRead"))
      .map(_.take(150)).mkString("\n"))

    // persist() variant: InMemoryRelation keeps the cached plan's
    // outputPartitioning (localCheckpoint's LogicalRDD drops the
    // AQE-coalesced partitioning), so the doc_id layout should carry
    // into the rollup with NO exchange — and lineage stays recomputable
    // (the fault-tolerance trade localCheckpoint makes goes away)
    val tfP = tfPlan2.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tfP.count() // materialize once
    val down3 = downstream(tfP)
    time("downstream3(persisted)") { noop(down3) }
    println("downstream3 exchanges: " + down3.queryExecution.executedPlan
      .toString.linesIterator.count(_.contains("Exchange hashpartitioning")))
    tfP.unpersist(true)

    // sub-split of stage 4: rollup without the broadcast join/score —
    // isolates the collect_list struct-sort cost
    time("rollup_only") {
      noop(tfCp.groupBy(col("doc_id"))
        .agg(slice(array_sort(collect_list(struct(
          (-col("tf")).as("ns"), col("w")))), 1, 3).as("top")))
    }

    // reference: the registry query end-to-end
    time("full_registry_query") {
      noop(graft.SparkEntry.queries("text_tfidf_topterms")(spark, dir))
    }
    spark.stop()
  }
}
