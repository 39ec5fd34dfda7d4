package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2 B (continued) — the reference's SQL-safety and run-metrics
  * surfaces, re-expressed as data operators.
  *
  *  - `sql_identifier_safety` (ref: src/utils/sql_safety.py:12
  *    VALID_IDENTIFIER / VALID_SCHEMA_TABLE, validate_identifier:18,
  *    quote_identifier:60): the reference validates identifiers one at a
  *    time before splicing them into repair/compare SQL; here validation
  *    is a columnar regex classification over a stream of candidate
  *    identifiers, emitting the per-dialect quoted form only for valid
  *    ones — same rules, set-at-a-time.
  *  - `recon_run_metrics` (ref: src/utils/metrics/reconciliation.py:98
  *    record_reconciliation_run + parallel/metrics.py): the reference
  *    pushes per-run counters to Prometheus; the Spark analog computes
  *    the same run-level rollup — tables checked / matched / mismatched,
  *    match rate, row totals — as a 1-row DataFrame a metrics publisher
  *    would export.
  */
object SafetySuite {

  /** Candidate identifiers: every real column name in the lake schema
    * (all valid by construction — the positive class is real data) plus
    * a fixed negative/edge fixture the oracle reproduces verbatim
    * (hyphens, leading digit, embedded quote/space/semicolon, empty,
    * schema-qualified, unicode).
    */
  private val EdgeIdents = Seq(
    "order-key", "1abc", "", "drop table", "a.b", "a.b.c", "séance",
    "ok_ident", "_lead", "Robert'); DROP", "col;", "schema.tbl_2")
  private def edgeSqlValues =
    EdgeIdents.map(s => "('" + s.replace("'", "''") + "')").mkString(", ")

  /** The reference's exact patterns (sql_safety.py:12-15), anchored. */
  private val IdentRe = "^[a-zA-Z_][a-zA-Z0-9_]*$"
  private val SchemaTableRe = "^[a-zA-Z_][a-zA-Z0-9_]*(\\.[a-zA-Z_][a-zA-Z0-9_]*)?$"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_identifier_safety" -> { (s, d) =>
      // column names of the four recon tables, via the scan schema (no
      // data read — the identifier stream is metadata + the edge fixture)
      val names =
        (Tables.orders(s, d).columns ++ Tables.customer(s, d).columns ++
          Tables.supplier(s, d).columns ++ Tables.nation(s, d).columns).toSeq
      import s.implicits._
      val cands = names.toDF("ident").unionByName(EdgeIdents.toDF("ident"))
      cands
        .withColumn("is_valid", col("ident").rlike(IdentRe))
        .withColumn("is_valid_schema_table", col("ident").rlike(SchemaTableRe))
        .select(col("ident"), col("is_valid"), col("is_valid_schema_table"),
          when(col("is_valid"), concat(lit("\""), col("ident"), lit("\"")))
            .otherwise(lit(null)).as("quoted_pg"),
          when(col("is_valid"), concat(lit("["), col("ident"), lit("]")))
            .otherwise(lit(null)).as("quoted_mssql"))
        // md5 order: collation-proof across engines (the fixture holds
        // non-ASCII identifiers; binary vs locale collation must not
        // reorder the output)
        .orderBy(md5(col("ident")))
    },

    "recon_run_metrics" -> { (s, d) =>
      // composes the per-table reconciliation (one pass, partition-
      // parallel) into the run-level record the reference emits per
      // scheduled run (metrics/reconciliation.py:98: tables, mismatches,
      // duration labels; row counts from parallel/metrics.py).
      val mt = ReconSuite.queries("recon_multi_table")(s, d)
      mt.agg(
          count(lit(1)).as("tables_checked"),
          sum(when(col("status") === "MATCH", 1L).otherwise(0L)).as("tables_matched"),
          sum(when(col("status") =!= "MATCH", 1L).otherwise(0L)).as("tables_mismatched"),
          sum(col("source_rows")).as("source_rows_total"),
          sum(col("target_rows")).as("target_rows_total"),
          max(abs(col("source_rows") - col("target_rows"))).as("max_row_delta"))
        .withColumn("match_rate6",
          floor(col("tables_matched").cast("double") / col("tables_checked") * 1e6 + 0.5) / 1e6)
    }
  )

  def oracles: Map[String, String] = Map(
    "sql_identifier_safety" ->
      s"""WITH cols AS (
         |  SELECT column_name AS ident FROM (
         |    DESCRIBE SELECT * FROM orders) o
         |  UNION ALL SELECT column_name FROM (DESCRIBE SELECT * FROM customer) c
         |  UNION ALL SELECT column_name FROM (DESCRIBE SELECT * FROM supplier) s
         |  UNION ALL SELECT column_name FROM (DESCRIBE SELECT * FROM nation) n
         |  UNION ALL SELECT * FROM (VALUES $edgeSqlValues) v(ident)),
         |cl AS (
         |  SELECT ident,
         |    regexp_matches(ident, '$IdentRe') AS is_valid,
         |    regexp_matches(ident, '$SchemaTableRe') AS is_valid_schema_table
         |  FROM cols)
         |SELECT ident, is_valid, is_valid_schema_table,
         |  CASE WHEN is_valid THEN '"' || ident || '"' END AS quoted_pg,
         |  CASE WHEN is_valid THEN '[' || ident || ']' END AS quoted_mssql
         |FROM cl ORDER BY md5(ident)""".stripMargin,

    "recon_run_metrics" ->
      s"""WITH mt AS (${ReconSuite.oracles("recon_multi_table")})
         |SELECT tables_checked, tables_matched, tables_mismatched,
         |  source_rows_total, target_rows_total, max_row_delta,
         |  FLOOR(CAST(tables_matched AS DOUBLE) / tables_checked * 1e6 + 0.5) / 1e6
         |    AS match_rate6
         |FROM (
         |  SELECT COUNT(*) AS tables_checked,
         |    CAST(SUM(CASE WHEN status = 'MATCH' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS tables_matched,
         |    CAST(SUM(CASE WHEN status <> 'MATCH' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS tables_mismatched,
         |    CAST(SUM(source_rows) AS BIGINT) AS source_rows_total,
         |    CAST(SUM(target_rows) AS BIGINT) AS target_rows_total,
         |    MAX(ABS(source_rows - target_rows)) AS max_row_delta
         |  FROM mt) t""".stripMargin
  )
}
