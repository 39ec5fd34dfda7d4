package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{CdcSource, Scratch, SourceSpec}

/** Contract spec for the external-source seam (no live DB/broker in the
  * sandbox): asserts the CONSTRUCTED spec/reader — format, the
  * partitioned-read options a 100 TB JDBC bootstrap needs, the envelope
  * decode, and streaming-vs-batch parity of the file test double.
  */
class CdcSourceSpec extends SparkSpecBase {

  test("jdbcSnapshot spec carries the full partitioned-read contract") {
    val spec = CdcSource.jdbcSnapshot(
      url = "jdbc:postgresql://db:5432/target",
      table = "public.orders",
      partitionColumn = "o_orderkey",
      lowerBound = 1L, upperBound = 6000000L,
      numPartitions = 64, user = "replicator")
    assert(spec.format == "jdbc")
    assert(spec.options("dbtable") == "public.orders")
    // the four options that turn one cursor into 64 parallel range
    // scans — without them spark.read.jdbc is a single-connection read
    assert(spec.options("partitionColumn") == "o_orderkey")
    assert(spec.options("lowerBound") == "1")
    assert(spec.options("upperBound") == "6000000")
    assert(spec.options("numPartitions") == "64")
    assert(spec.options("fetchsize").toInt > 0, "streaming cursor, not a buffered read")
    assert(spec.options("user") == "replicator")
  }

  test("jdbc reader constructs without connecting") {
    // load() would open a connection (none exists here); constructing
    // the reader must not — that's what lets the same code path be
    // configured in tests and executed against a real DB in production
    val spec = CdcSource.jdbcSnapshot("jdbc:postgresql://db:5432/t", "orders",
      "o_orderkey", 0L, 100L, 8)
    val reader = CdcSource.reader(spark, spec)
    assert(reader != null)
  }

  test("kafkaTopic spec binds the topic and bounded-batch options") {
    val spec = CdcSource.kafkaTopic("broker:9092", "cdc.orders")
    assert(spec.format == "kafka")
    assert(spec.options("subscribe") == "cdc.orders")
    assert(spec.options("kafka.bootstrap.servers") == "broker:9092")
    assert(spec.options("startingOffsets") == "earliest")
    assert(spec.options("maxOffsetsPerTrigger").toLong > 0)
  }

  test("fileEnvelopeFeed exposes the Kafka value-column shape") {
    val dir = Scratch.dir("cdcsource_feed_shape")
    spark.range(1).select(lit("""{"op":"c","ts_ms":1,"source":{"seq":1},"before":null,"after":{"id":7,"custkey":3,"status":"O"}}""").as("value"))
      .write.mode("overwrite").text(dir)
    val feed = CdcSource.load(spark, CdcSource.fileEnvelopeFeed(dir))
    assert(feed.schema == StructType(Seq(StructField("value", StringType))))
    assert(feed.count() == 1)
  }

  test("parseEnvelope decodes upserts from after and deletes from before") {
    val s = spark
    import s.implicits._
    val feed = Seq(
      """{"op":"c","ts_ms":100,"source":{"seq":1},"before":null,"after":{"id":1,"custkey":10,"status":"O"}}""",
      """{"op":"u","ts_ms":200,"source":{"seq":2},"before":{"id":1,"custkey":10,"status":"O"},"after":{"id":1,"custkey":10,"status":"U"}}""",
      """{"op":"d","ts_ms":300,"source":{"seq":3},"before":{"id":1,"custkey":10,"status":"U"},"after":null}""",
      """not json at all"""
    ).toDF("value")
    val rows = CdcSource.parseEnvelope(feed).orderBy("seq").collect()
    assert(rows.length == 3, "malformed line filtered, three events kept")
    assert(rows.map(_.getAs[String]("op")).toSeq == Seq("c", "u", "d"))
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(1L, 1L, 1L))
    // delete has no after image: key/payload come from before
    assert(rows(2).getAs[Long]("custkey") == 10L)
    assert(rows(1).getAs[String]("status") == "U")
    assert(rows.map(_.getAs[Long]("seq")).toSeq == Seq(1L, 2L, 3L))
  }

  test("loadStream serves the same spec as an unbounded source") {
    val dir = Scratch.dir("cdcsource_stream")
    spark.range(10).selectExpr("id", "CAST(id % 3 AS STRING) AS v")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val spec = SourceSpec("parquet",
      Map("path" -> dir, "maxFilesPerTrigger" -> "1"), Some(schema))
    val stream = CdcSource.loadStream(spark, spec)
    assert(stream.isStreaming, "seam must produce a streaming frame under readStream")
    assert(stream.schema == schema)
    // batch read through the same seam sees identical data
    assert(CdcSource.load(spark, spec).count() == 10)
  }

  test("cdc_source_roundtrip lands exactly on the in-memory log's apply") {
    val viaSeam = graft.operators.CdcSuite.queries("cdc_source_roundtrip")(spark, sf)
    val direct = graft.operators.CdcSuite.queries("cdc_apply_latest")(spark, sf)
    assert(viaSeam.exceptAll(direct).isEmpty && direct.exceptAll(viaSeam).isEmpty,
      "seam roundtrip diverged from the direct apply")
  }
}
