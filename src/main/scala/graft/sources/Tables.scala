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

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts is parquet INT64 TIMESTAMP(NANOS) which Spark 4 refuses to
    * read natively; read it as raw nanos and truncate to microseconds
    * (integer DIV — ns epochs exceed 2^53 so double division would lose
    * precision), matching DuckDB's own ns→µs truncation.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
