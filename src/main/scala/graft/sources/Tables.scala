package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet loaders for the driver-provided TPC-H-ish lake.
  *
  * In the reference these tables live in SQL Server (source) and
  * PostgreSQL (target) and every tool opens its own cursor
  * (reference: src/utils/db_pool/{sqlserver,postgres}.py). Here the lake
  * is parquet and Spark's datasource handles partition discovery,
  * predicate pushdown and column pruning — callers should `.select` /
  * `.filter` as early as possible so pushdown reaches the scan.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Spread a coarse scan across the session's cores before heavy
    * per-row compute (md5/shingle/vector work). A single-row-group
    * parquet file yields ONE scan task no matter what
    * `maxPartitionBytes` says — the fixture lake is exactly that — so
    * without this every per-document hash pipeline serializes on one
    * core. On a real lake the scan already has ≥ parallelism splits
    * and this is a no-op (no shuffle inserted); the round-robin
    * repartition only fires when the source under-splits. Callers
    * project BEFORE spreading so the shuffle carries only the columns
    * the operator needs.
    *
    * Apply ONLY where per-row compute dominates (measured at sf0.1:
    * text_fingerprint 1.35→0.85 s, text_contamination 1.34→0.94 s);
    * scan+aggregate shapes get SLOWER because the inserted shuffle
    * outweighs the map-side parallelism (q1 0.44→0.78 s,
    * emb_centroid_drift 0.50→0.98 s — their heavy lifting already
    * happens after their own exchange).
    */
  def spread(s: SparkSession, df: DataFrame): DataFrame = {
    val target = s.sparkContext.defaultParallelism
    // probe via toRdd (InternalRow), not df.rdd: both force physical
    // planning of a probe lineage, but df.rdd additionally builds the
    // row-deserializer layer. Callers must pass a NEAR-LEAF frame (a
    // scan/union plus narrow projections): the probe re-plans the
    // argument, so a wide plan would pay its planning twice.
    if (df.queryExecution.toRdd.getNumPartitions < target) df.repartition(target)
    else df
  }

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts has shipped as both INT64 TIMESTAMP(NANOS) (which Spark 4
    * only reads via the nanosAsLong legacy conf, as a raw long) and
    * plain TIMESTAMP(MICROS) NTZ across testdata generations — dispatch
    * on the INFERRED type so either lake layout works. Nanos truncate to
    * microseconds with integer DIV (ns epochs exceed 2^53, double
    * division would lose precision), matching DuckDB's own ns→µs
    * truncation; NTZ micros cast to session-local TIMESTAMP (the
    * session is pinned UTC, so the wall-clock is the instant).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case other =>
        // fail loudly on the NEXT drift: a blanket cast would silently
        // coerce e.g. a STRING or DATE ts (possibly to nulls) instead of
        // surfacing the layout change the way the NANOS/MICROS one did
        throw new IllegalStateException(
          s"events.ts has unsupported parquet type $other in $d — " +
            "extend Tables.events' dispatch for this lake generation")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
