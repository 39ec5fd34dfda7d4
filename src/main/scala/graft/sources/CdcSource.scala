package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamReader
import org.apache.spark.sql.types._

/** External-source description: a DataSource V1/V2 format name plus its
  * options map, optionally with an explicit read schema. The CDC ingest
  * is parameterized over this — the same downstream pipeline (envelope
  * parse → ordering → apply/SCD2) runs whether the change feed arrives
  * from a Kafka topic, a JDBC snapshot query, or landed files.
  *
  * The sandbox has no live broker or database, so the lake's file feeds
  * are the TEST IMPLEMENTATION of this seam: specs assert the
  * constructed spec/reader contract (format, partitioned-read options,
  * envelope schema, ordering), and `cdc_source_roundtrip` proves the
  * envelope → typed-log path end-to-end against the DuckDB oracle.
  */
final case class SourceSpec(
    format: String,
    options: Map[String, String],
    schema: Option[StructType] = None)

/** The reference pipeline's ingest edge re-expressed as Spark
  * DataSource wiring (ref: docker/configs — Debezium SQL Server source
  * → Kafka → JDBC sink; src/utils/db_pool/sqlserver.py:1,
  * postgres.py:1 — pooled snapshot/requery connections).
  *
  * Spark-first: ingest is `spark.read/readStream.format(...)`, never a
  * hand-rolled cursor loop. The JDBC bootstrap read is range-partitioned
  * (`partitionColumn`/`lowerBound`/`upperBound`/`numPartitions`), so a
  * 100 TB snapshot lands as N parallel executor-side range scans —
  * predicates and the partition ranges push down to the database as
  * WHERE clauses; nothing funnels through the driver.
  */
object CdcSource {

  /** Debezium-style dual-image envelope schema (ref:
    * specs/001-sqlserver-pg-cdc/contracts/debezium-sqlserver-source.json —
    * op, ts_ms, before/after images, and the source block whose LSN
    * (here `seq`) gives the total per-key order).
    */
  val EnvelopeSchema: StructType = StructType(Seq(
    StructField("op", StringType),
    StructField("ts_ms", LongType),
    StructField("source", StructType(Seq(
      StructField("seq", LongType)))),
    StructField("before", StructType(Seq(
      StructField("id", LongType), StructField("custkey", LongType),
      StructField("status", StringType)))),
    StructField("after", StructType(Seq(
      StructField("id", LongType), StructField("custkey", LongType),
      StructField("status", StringType))))))

  /** Batch reader for a spec. Schema (when given) is applied BEFORE
    * load so file sources skip inference — at scale, inference is a
    * full extra pass over the feed.
    */
  def reader(spark: SparkSession, spec: SourceSpec): DataFrameReader = {
    val r = spark.read.format(spec.format).options(spec.options)
    spec.schema.fold(r)(r.schema)
  }

  // a "path" option (if any) is picked up by load() itself — passing it
  // again as an argument is an AnalysisException since Spark 3
  def load(spark: SparkSession, spec: SourceSpec): DataFrame =
    reader(spark, spec).load()

  /** Streaming reader for a spec — the same seam under `readStream`,
    * so the structured-streaming twins consume an identical contract
    * (CdcStream's landed-file feed is this with format=parquet).
    */
  def streamReader(spark: SparkSession, spec: SourceSpec): DataStreamReader = {
    val r = spark.readStream.format(spec.format).options(spec.options)
    spec.schema.fold(r)(r.schema)
  }

  def loadStream(spark: SparkSession, spec: SourceSpec): DataFrame =
    streamReader(spark, spec).load()

  /** Range-partitioned JDBC bootstrap/snapshot read (ref: the sink
    * bootstrap `SELECT *` in src/utils/db_pool/postgres.py:1, and the
    * Debezium source's initial snapshot). `numPartitions` concurrent
    * connections each scan one `partitionColumn` range — the database
    * sees N indexed range queries, Spark sees N input partitions, and
    * no single connection carries the whole table. `fetchsize` keeps
    * the per-connection cursor streaming instead of buffering.
    */
  def jdbcSnapshot(
      url: String,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int,
      user: String = "",
      fetchSize: Int = 10000,
      extra: Map[String, String] = Map.empty): SourceSpec =
    SourceSpec("jdbc", Map(
      "url" -> url,
      "dbtable" -> table,
      "partitionColumn" -> partitionColumn,
      "lowerBound" -> lowerBound.toString,
      "upperBound" -> upperBound.toString,
      "numPartitions" -> numPartitions.toString,
      "fetchsize" -> fetchSize.toString,
      // cheap isolation for snapshot reads; the consistent cut comes
      // from the CDC log replayed on top (cdc_bootstrap_merge)
      "isolationLevel" -> "READ_COMMITTED"
    ) ++ (if (user.nonEmpty) Map("user" -> user) else Map.empty) ++ extra)

  /** Kafka change-topic spec (ref: docker/configs connect topics). The
    * envelope arrives in the `value` column; `parseEnvelope` below is
    * the shared decode step. maxOffsetsPerTrigger bounds per-batch
    * state growth the same way maxFilesPerTrigger does for the file
    * test double.
    */
  def kafkaTopic(
      bootstrapServers: String,
      topic: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Long = 1000000L): SourceSpec =
    SourceSpec("kafka", Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets,
      "maxOffsetsPerTrigger" -> maxOffsetsPerTrigger.toString,
      "failOnDataLoss" -> "false"))

  /** File-backed test double for the Kafka value feed: a text source
    * whose lines are envelope JSON — the same `value: string` column
    * shape a Kafka source exposes (after the byte→string cast), so
    * everything downstream of the source is identical in tests and
    * production.
    */
  def fileEnvelopeFeed(path: String): SourceSpec =
    SourceSpec("text", Map("path" -> path),
      Some(StructType(Seq(StructField("value", StringType)))))

  /** Shared envelope decode: Kafka/file `value` → the typed change log
    * (id, custkey, status, op, seq, ts_ms). Upserts read the after
    * image; deletes carry only the before image, so the key comes from
    * whichever side is present. One codegen'd from_json per row — no
    * shuffle; malformed lines yield null ids and are routed out (the
    * DLQ split is cdc_dlq_router's job, the filter here keeps the
    * happy path total).
    */
  def parseEnvelope(feed: DataFrame, valueCol: String = "value"): DataFrame =
    feed
      .select(from_json(col(valueCol).cast("string"), EnvelopeSchema).as("e"))
      .select(
        coalesce(col("e.after.id"), col("e.before.id")).as("id"),
        coalesce(col("e.after.custkey"), col("e.before.custkey")).as("custkey"),
        coalesce(col("e.after.status"), col("e.before.status")).as("status"),
        col("e.op").as("op"),
        col("e.source.seq").as("seq"),
        col("e.ts_ms").as("ts_ms"))
      .filter(col("id").isNotNull)
}
