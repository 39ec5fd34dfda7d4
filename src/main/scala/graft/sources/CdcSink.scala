package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row}

/** The sink half of the external-I/O seam (ref:
  * docker/configs/kafka-connect/postgresql-sink.json — JDBC sink,
  * `insert.mode=upsert`, `pk.mode=record_value`, delete rewrite): how a
  * materialized change batch lands in a relational target.
  *
  * Spark-first: plain appends go through `df.write.format("jdbc")`
  * (per-partition batched inserts — `numPartitions` concurrent
  * connections, `batchsize` rows per round trip). UPSERTS need
  * dialect SQL Spark's JDBC writer doesn't speak, so the seam exposes
  * the same prepared-statement templates the connector builds
  * (`INSERT … ON CONFLICT DO UPDATE` / `MERGE`), to be executed per
  * partition against a pooled connection. The sandbox has no live
  * database, so specs assert the constructed writer/templates, and the
  * `cdc_sink_upsert_script` operator proves the value-inlined statement
  * stream against the DuckDB oracle (the same emit-DML-as-rows contract
  * as recon_repair — statements stay distributed and write straight to
  * a text sink).
  */
object CdcSink {

  /** Identifier quoting per target dialect (same convention as
    * ReconSuite's repair emitter).
    */
  private def q(id: String, dialect: String): String =
    // escape by doubling the closing quote char, as the JDBC dialects
    // do — an embedded ] or " in an identifier must not break out
    if (dialect == "sqlserver") "[" + id.replace("]", "]]") + "]"
    else "\"" + id.replace("\"", "\"\"") + "\""

  /** Plain-append JDBC writer with the batching/parallelism contract a
    * large load needs: `numPartitions` caps concurrent connections (the
    * connector's connection.pool.size analog), `batchsize` the rows per
    * statement round trip (its batch.size). Append mode — the upsert
    * path goes through the statement templates below.
    */
  def jdbcAppendWriter(
      df: DataFrame,
      url: String,
      table: String,
      user: String = "",
      batchSize: Int = 3000,
      numPartitions: Int = 10): DataFrameWriter[Row] = {
    val w = df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize.toString)
      .option("numPartitions", numPartitions.toString)
      .option("isolationLevel", "READ_COMMITTED")
      .mode("append")
    if (user.nonEmpty) w.option("user", user) else w
  }

  /** The connector's upsert statement (insert.mode=upsert,
    * pk.mode=record_value): Postgres `ON CONFLICT … DO UPDATE SET` with
    * EXCLUDED references; SQL Server a keyed MERGE. `?` placeholders in
    * column order — executed per partition with a prepared statement
    * and `batchSize`-row batches.
    */
  def upsertTemplate(table: String, cols: Seq[String], keyCols: Seq[String],
      dialect: String = "postgres"): String = {
    require(keyCols.nonEmpty && keyCols.forall(cols.contains), "keys must be columns")
    val valCols = cols.filterNot(keyCols.contains)
    if (dialect == "sqlserver") {
      val on = keyCols.map(k => s"t.${q(k, dialect)} = s.${q(k, dialect)}").mkString(" AND ")
      val set = valCols.map(c => s"t.${q(c, dialect)} = s.${q(c, dialect)}").mkString(", ")
      val srcCols = cols.map(q(_, dialect)).mkString(", ")
      val ins = cols.map(c => s"s.${q(c, dialect)}").mkString(", ")
      s"MERGE INTO ${q(table, dialect)} t USING (VALUES (${cols.map(_ => "?").mkString(", ")}))" +
        s" s ($srcCols) ON $on" +
        s" WHEN MATCHED THEN UPDATE SET $set" +
        s" WHEN NOT MATCHED THEN INSERT ($srcCols) VALUES ($ins);"
    } else {
      val set = valCols.map(c => s"${q(c, dialect)} = EXCLUDED.${q(c, dialect)}").mkString(", ")
      s"INSERT INTO ${q(table, dialect)} (${cols.map(q(_, dialect)).mkString(", ")})" +
        s" VALUES (${cols.map(_ => "?").mkString(", ")})" +
        s" ON CONFLICT (${keyCols.map(q(_, dialect)).mkString(", ")}) DO UPDATE SET $set;"
    }
  }

  /** The connector's delete statement (delete.enabled — a tombstoned key
    * removes the target row).
    */
  def deleteTemplate(table: String, keyCols: Seq[String],
      dialect: String = "postgres"): String =
    s"DELETE FROM ${q(table, dialect)} WHERE " +
      keyCols.map(k => s"${q(k, dialect)} = ?").mkString(" AND ") + ";"
}
