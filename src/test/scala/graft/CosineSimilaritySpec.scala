package graft

import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpecBase {

  test("native cosine_sim is bit-identical to the fold formulation") {
    org.apache.spark.sql.graft.Bridge.register(spark)
    val e = graft.sources.Tables.embeddings(spark, sf).limit(50)
    val pairs = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .withColumn("native", expr("cosine_sim(a.embedding, b.embedding)"))
      .withColumn("fold",
        expr("aggregate(zip_with(a.embedding, b.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)") /
          (expr("sqrt(aggregate(a.embedding, CAST(0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))") *
           expr("sqrt(aggregate(b.embedding, CAST(0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))")))
    val diff = pairs.filter(col("native") =!= col("fold")).count()
    assert(diff == 0, "native expression must reproduce the fold bit-for-bit")
  }

  test("cosine_sim participates in whole-stage codegen") {
    org.apache.spark.sql.graft.Bridge.register(spark)
    val e = graft.sources.Tables.embeddings(spark, sf)
    val df = e.select(expr("cosine_sim(embedding, embedding)").as("c"))
    // the `*(n)` prefix is how simpleString marks a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [cosine_sim"), s"expected codegen'd project in:\n$plan")
    // and it evaluates without codegen fallback errors
    assert(df.collect().forall(r => !r.isNullAt(0)))
  }

  test("jaccard_sim equals the composed array_intersect/array_union form") {
    org.apache.spark.sql.graft.Bridge.register(spark)
    val docs = graft.sources.Tables.documents(spark, sf).limit(40)
      .select(col("doc_id"), array_distinct(split(lower(col("text")), " ")).as("w"))
    val pairs = docs.as("a").crossJoin(docs.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .withColumn("native", expr("jaccard_sim(a.w, b.w)"))
      .withColumn("composed",
        size(array_intersect(col("a.w"), col("b.w"))).cast("double") /
          size(array_union(col("a.w"), col("b.w"))))
    assert(pairs.filter(col("native") =!= col("composed")).count() == 0)
  }

  test("optimizer rule fuses the composed jaccard pattern") {
    import org.apache.spark.sql.graft.RewriteComposedJaccard
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.experimental.extraOptimizations =
      classic.experimental.extraOptimizations :+ RewriteComposedJaccard
    try {
      val docs = graft.sources.Tables.documents(spark, sf).limit(20)
        .select(col("doc_id"), array_distinct(split(lower(col("text")), " ")).as("w"))
      val composed = docs.as("a").crossJoin(docs.as("b"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id"),
          (size(array_intersect(col("a.w"), col("b.w"))).cast("double") /
            size(array_union(col("a.w"), col("b.w")))).as("j"))
      val plan = composed.queryExecution.optimizedPlan.toString
      assert(plan.contains("jaccard_sim"), s"rule did not fire:\n$plan")
      // and the rewritten plan still computes correct values
      val rows = composed.collect()
      assert(rows.nonEmpty && rows.forall { r =>
        val j = r.getDouble(2); j >= 0.0 && j <= 1.0
      })
    } finally {
      classic.experimental.extraOptimizations =
        classic.experimental.extraOptimizations.filterNot(_ == RewriteComposedJaccard)
    }
  }

  test("streaming exact dedup equals the batch group-by") {
    val stream = graft.streaming.CdcStream.queries("stream_dedup_exact")(spark, sf)
      .collect().map(_.toSeq)
    val batch = graft.operators.DedupSuite.queries("dedup_exact")(spark, sf)
      .collect().map(_.toSeq)
    assert(stream.sameElements(batch))
  }

  test("streaming minhash dedup equals the batch LSH pipeline") {
    val stream = graft.streaming.CdcStream.queries("stream_dedup_minhash")(spark, sf)
      .collect().map(_.toSeq)
    val batch = graft.operators.DedupSuite.queries("dedup_minhash_lsh")(spark, sf)
      .collect().map(_.toSeq)
    assert(stream.nonEmpty && stream.sameElements(batch))
    spark.catalog.clearCache()
  }

  test("streaming mixture monitor equals the batch mix_weights table") {
    val stream = graft.streaming.CdcStream.queries("stream_mix_monitor")(spark, sf)
      .collect().map(_.toSeq)
    val batch = graft.operators.LlmExtra.queries("mix_weights")(spark, sf)
      .collect().map(_.toSeq)
    assert(stream.nonEmpty && stream.sameElements(batch))
    spark.catalog.clearCache()
  }

  test("minhash stream state TTL evicts idle buckets at the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2000-01-01 $h%02d:00:00")
    val mem = MemoryStream[(String, Long, java.sql.Timestamp)](s)
    val qn = "mh_ttl_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = graft.streaming.CdcStream.minhashPairsStream(mem.toDS(), ttlMs = 3600 * 1000L)
      .toDF("doc_a", "doc_b")
      .writeStream.format("memory").queryName(qn)
      .option("checkpointLocation", graft.sources.Scratch.dir(qn + "_cp"))
      .outputMode("update").start()
    try {
      mem.addData(("b|1", 1L, ts(0)), ("b|2", 5L, ts(0)))
      q.processAllAvailable()                    // watermark → 00:00
      mem.addData(("b|2", 6L, ts(2)))            // watermark → 02:00; b|1 idle > 1h TTL
      q.processAllAvailable()
      mem.addData(("b|1", 2L, ts(3)), ("b|2", 7L, ts(3)))
      q.processAllAvailable()
      val pairs = spark.table(qn).as[(Long, Long)].collect().toSet
      assert(pairs.contains((5L, 6L)), "pair within the TTL horizon must be found")
      assert(pairs.contains((6L, 7L)) && pairs.contains((5L, 7L)),
        "bucket refreshed before its timeout keeps its accumulated state")
      assert(!pairs.contains((1L, 2L)),
        "bucket b|1 idle past the TTL must be evicted, so doc 2 finds empty state")
    } finally q.stop()
  }

  test("optimizer rule fuses the composed md5-60 min pattern") {
    import org.apache.spark.sql.graft.RewriteComposedHash60
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.experimental.extraOptimizations =
      classic.experimental.extraOptimizations :+ RewriteComposedHash60
    try {
      val docs = graft.sources.Tables.documents(spark, sf).limit(50)
        .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
        .withColumn("composed",
          expr("array_min(transform(ws, w -> CAST(conv(substr(md5(w), 1, 15), 16, 10) AS BIGINT)))"))
      val plan = docs.queryExecution.optimizedPlan.toString
      assert(plan.contains("hash60_min"), s"rule did not fire:\n$plan")
      // rewritten values equal the native expression's
      org.apache.spark.sql.graft.Bridge.register(spark)
      val check = docs.withColumn("native", expr("hash60_min(ws)"))
      assert(check.filter(col("composed") =!= col("native")).count() == 0)
    } finally {
      classic.experimental.extraOptimizations =
        classic.experimental.extraOptimizations.filterNot(_ == RewriteComposedHash60)
    }
  }

  test("simhash60 equals the composed nested-aggregate form") {
    org.apache.spark.sql.graft.Bridge.register(spark)
    val docs = graft.sources.Tables.documents(spark, sf).limit(50)
      .withColumn("whs", expr(
        "transform(array_distinct(split(lower(text), ' ')), w -> CAST(conv(substr(md5(w), 1, 15), 16, 10) AS BIGINT))"))
      .withColumn("native", expr("simhash60(whs)"))
      .withColumn("composed", expr(
        """aggregate(sequence(0, 59), CAST(0 AS BIGINT), (acc, b) ->
          |  acc + IF(aggregate(whs, 0, (a2, h) ->
          |    a2 + IF((h div CAST(pow(2, b) AS BIGINT)) % 2 = 1, 1, -1)) > 0,
          |    shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT)))""".stripMargin))
    assert(docs.filter(col("native") =!= col("composed")).count() == 0)
  }

  test("minhash_sigs equals the composed transform/array_min pipeline") {
    org.apache.spark.sql.graft.Bridge.register(spark)
    val docs = graft.sources.Tables.documents(spark, sf).limit(100)
      .withColumn("ws", split(lower(col("text")), " "))
      .filter(size(col("ws")) >= 3)
      .withColumn("shingles", expr(graft.operators.DedupSuite.ShinglesExpr))
      .withColumn("native", expr("minhash_sigs(shingles, 12)"))
      .withColumn("composed", expr(
        """transform(sequence(0, 11), p ->
          |  array_min(transform(
          |    transform(shingles, sh -> CAST(conv(substr(md5(sh), 1, 15), 16, 10) AS BIGINT)),
          |    h -> ((h % 1073741789) * ((40503 * (p + 1)) % 1073741789) + p) % 1073741789)))""".stripMargin))
    assert(docs.filter(col("native") =!= col("composed")).count() == 0,
      "native signature must reproduce the composed pipeline exactly")
    // and it must run inside whole-stage codegen (the point of fusing) —
    // materialize first so the AQE plan finalizes and stage markers appear
    val sel = docs.select("native")
    sel.collect()
    val plan = sel.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      s"minhash_sigs fell out of codegen:\n$plan")
  }

  test("hash60_min equals the composed array_min of md5-60 hashes") {
    org.apache.spark.sql.graft.Bridge.register(spark)
    val docs = graft.sources.Tables.documents(spark, sf).limit(100)
      .withColumn("ws", split(lower(col("text")), " "))
      .filter(size(col("ws")) >= 1)
      .withColumn("native", expr("hash60_min(ws)"))
      .withColumn("composed",
        expr("array_min(transform(ws, w -> CAST(conv(substr(md5(w), 1, 15), 16, 10) AS BIGINT)))"))
    assert(docs.filter(col("native") =!= col("composed")).count() == 0)
  }

  test("gram_hashes60 equals the composed slice/concat_ws/md5 pipeline") {
    org.apache.spark.sql.graft.Bridge.register(spark)
    val docs = graft.sources.Tables.documents(spark, sf).limit(100)
      .withColumn("ws", split(lower(col("text")), " "))
      .filter(size(col("ws")) >= 13)
      .withColumn("native", expr("gram_hashes60(ws, 13)"))
      .withColumn("composed", expr(
        """transform(sequence(1, size(ws) - 12),
          |  i -> CAST(conv(substr(md5(concat_ws(' ', slice(ws, i, 13))), 1, 15), 16, 10) AS BIGINT))""".stripMargin))
    assert(docs.filter(col("native") =!= col("composed")).count() == 0)
    // short input → null (callers guard with coalesce/CASE)
    val short = spark.sql("SELECT gram_hashes60(array('a','b'), 13) AS g")
    assert(short.collect().head.isNullAt(0))
  }

  test("null array elements are skipped exactly like the composed forms") {
    org.apache.spark.sql.graft.Bridge.register(spark)
    import SparkTestSession.spark.implicits._
    // containsNull=true arrays through a real scan, so both the codegen
    // and eval paths see nullable slots (ADVICE r3: natives used to hash
    // every slot — empty-string min on unsafe arrays, NPE on generic)
    val df = Seq(
      Seq("alpha", null, "beta", "gamma"),
      Seq[String](null, null),          // all-null → null, like array_min
      Seq("solo"),
      Seq(null, "tail")
    ).toDF("ws")
    val checked = df
      .withColumn("hm_native", expr("hash60_min(ws)"))
      .withColumn("hm_composed",
        expr("array_min(transform(ws, w -> CAST(conv(substr(md5(w),1,15),16,10) AS BIGINT)))"))
      .withColumn("ms_native", expr("minhash_sigs(ws, 4)"))
      .withColumn("ms_composed", expr(
        """CASE WHEN size(filter(ws, w -> w IS NOT NULL)) = 0 THEN NULL
          | ELSE transform(sequence(0, 3), p -> array_min(transform(
          |   transform(ws, sh -> CAST(conv(substr(md5(sh),1,15),16,10) AS BIGINT)),
          |   h -> ((h % 1073741789) * ((40503 * (p + 1)) % 1073741789) + p) % 1073741789)))
          | END""".stripMargin))
      .withColumn("gh_native", expr("gram_hashes60(ws, 2)"))
      .withColumn("gh_composed", expr(
        """CASE WHEN size(ws) < 2 THEN NULL
          | ELSE transform(sequence(1, size(ws) - 1), i ->
          |   CAST(conv(substr(md5(concat_ws(' ', slice(ws, i, 2))),1,15),16,10) AS BIGINT))
          | END""".stripMargin))
    assert(checked.filter(!(col("hm_native") <=> col("hm_composed"))).count() == 0)
    assert(checked.filter(!(col("ms_native") <=> col("ms_composed"))).count() == 0)
    assert(checked.filter(!(col("gh_native") <=> col("gh_composed"))).count() == 0)
    // all-null input yields null signatures, not a MAX_VALUE row
    val allNull = checked.filter(size(filter(col("ws"), w => w.isNull)) === size(col("ws")))
    assert(allNull.count() == 1)
    assert(allNull.select("hm_native", "ms_native").collect()
      .forall(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("cosine_sim handles nulls and self-similarity") {
    org.apache.spark.sql.graft.Bridge.register(spark)
    val e = graft.sources.Tables.embeddings(spark, sf).limit(5)
    val self = e.select(expr("cosine_sim(embedding, embedding)").as("c")).collect()
    self.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-9))
    val nulls = e.select(expr("cosine_sim(embedding, CAST(NULL AS ARRAY<FLOAT>))").as("c")).collect()
    nulls.foreach(r => assert(r.isNullAt(0)))
  }
}
