package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Portable._
import graft.sources.Tables

/** §2 B — reconciliation between a "source" and "target" table
  * (reference: src/reconciliation/).
  *
  * The reference opens two cursors and walks both tables in chunked
  * driver loops; graft expresses every comparison as a distributed plan:
  * counts are scans with partial aggregation, checksums are commutative
  * hash-sums (no global ORDER BY, unlike the reference's
  * `md5(string_agg(... ORDER BY pk))` whole-table query), and row-level
  * diff is one shuffle join on the primary key.
  *
  * The lake has only the source side, so each query derives the target
  * deterministically from `orders`:
  *   - rows with o_orderkey % 97 = 0 are dropped        → MISSING
  *   - rows with o_orderkey % 89 = 0 get status 'X'     → MODIFIED
  *   - copies with key+100000000 of o_orderkey % 101 = 0 → EXTRA
  * Both engines rebuild the identical target, so the oracle checks the
  * reconciliation logic itself.
  */
object ReconSuite {

  /** Canonical orders row-string for checksums: ints + strings only
    * (float/timestamp rendering is not engine-portable; the reference
    * likewise checksums a canonical text projection —
    * ref: compare/checksum.py:19 calculate_checksum).
    */
  private def orowStr: Column =
    rowStr(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_orderpriority"))
  private val orowSql =
    "concat_ws('|', CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR), o_orderstatus, o_orderpriority)"

  /** Deterministic perturbed target (Spark side). */
  private def target(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val kept = o.filter(col("o_orderkey") % 97 =!= 0)
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 89 === 0, lit("X")).otherwise(col("o_orderstatus")))
    val extra = o.filter(col("o_orderkey") % 101 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
    kept.unionByName(extra)
  }

  /** The same target in the DuckDB dialect. */
  private val TargetSql =
    """SELECT o_orderkey, o_custkey,
      |  CASE WHEN o_orderkey % 89 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
      |  o_totalprice, o_orderdate, o_orderpriority
      |FROM orders WHERE o_orderkey % 97 <> 0
      |UNION ALL
      |SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
      |  o_totalprice, o_orderdate, o_orderpriority
      |FROM orders WHERE o_orderkey % 101 = 0""".stripMargin

  /** DuckDB analog of [[graft.functions.Portable.rowHash60]] summed per
    * group — the order-insensitive checksum.
    */
  private def ckSql(rowExpr: String) =
    s"CAST(SUM(CAST(('0x' || substr(md5($rowExpr), 1, 15)) AS BIGINT)) % 1152921504606846976 AS BIGINT)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "recon_rowcount" -> { (s, d) =>
      // ref: compare/counts.py:17 compare_row_counts — count compare with
      // difference + status, one row per table.
      val src = Tables.orders(s, d).agg(count(lit(1)).as("source_count"))
      val tgt = target(s, d).agg(count(lit(1)).as("target_count"))
      src.crossJoin(tgt)
        .select(lit("orders").as("table_name"), col("source_count"), col("target_count"),
          (col("target_count") - col("source_count")).as("difference"),
          when(col("source_count") === col("target_count"), lit("MATCH"))
            .otherwise(lit("MISMATCH")).as("status"))
    },

    "recon_checksum_agg" -> { (s, d) =>
      // whole-table order-insensitive checksum, one narrow shuffle
      // (ref: compare/checksum.py:19 calculate_checksum, re-expressed
      // commutatively so no global sort is needed at 100 TB).
      val src = Tables.orders(s, d).agg(checksumAgg(orowStr).as("source_checksum"))
      val tgt = target(s, d).agg(checksumAgg(orowStr).as("target_checksum"))
      src.crossJoin(tgt)
        .select(lit("orders").as("table_name"), col("source_checksum"), col("target_checksum"),
          when(col("source_checksum") === col("target_checksum"), lit("MATCH"))
            .otherwise(lit("MISMATCH")).as("status"))
    },

    "recon_checksum_chunked" -> { (s, d) =>
      // per-chunk checksums localize which pk range diverges
      // (ref: compare/checksum.py:180 calculate_checksum_chunked). Chunk =
      // pk % 32: bounded per-chunk state, embarrassingly parallel.
      val src = Tables.orders(s, d)
        .groupBy((col("o_orderkey") % 32).as("chunk"))
        .agg(checksumAgg(orowStr).as("source_checksum"), count(lit(1)).as("source_rows"))
      val tgt = target(s, d)
        .groupBy((col("o_orderkey") % 32).as("chunk"))
        .agg(checksumAgg(orowStr).as("target_checksum"), count(lit(1)).as("target_rows"))
      src.join(tgt, "chunk")
        .select(col("chunk"), col("source_rows"), col("target_rows"),
          when(col("source_checksum") === col("target_checksum"), lit("MATCH"))
            .otherwise(lit("MISMATCH")).as("status"))
        .orderBy("chunk")
    },

    "recon_incremental" -> { (s, d) =>
      // checksum only rows changed since the watermark — the 10-100x
      // shortcut (ref: incremental/checksum.py:142 _calculate_delta_checksum);
      // the predicate pushes down to the parquet scan.
      val cutoff = to_timestamp(lit("2000-01-01 00:00:00"))
      val src = Tables.orders(s, d).filter(col("o_orderdate") >= cutoff)
        .agg(checksumAgg(orowStr).as("source_checksum"), count(lit(1)).as("source_rows"))
      val tgt = target(s, d).filter(col("o_orderdate") >= cutoff)
        .agg(checksumAgg(orowStr).as("target_checksum"), count(lit(1)).as("target_rows"))
      src.crossJoin(tgt)
        .select(col("source_rows"), col("target_rows"),
          when(col("source_checksum") === col("target_checksum"), lit("MATCH"))
            .otherwise(lit("MISMATCH")).as("status"))
    },

    "recon_rowlevel" -> { (s, d) =>
      // ref: row_level/reconciler.py:78 RowLevelReconciler — full outer join on pk, classify
      // MISSING/EXTRA/MODIFIED, name the differing columns.
      val src = Tables.orders(s, d).select(
        col("o_orderkey").as("sk"), col("o_custkey").as("s_cust"),
        col("o_orderstatus").as("s_status"), col("o_orderpriority").as("s_prio"))
      val tgt = target(s, d).select(
        col("o_orderkey").as("tk"), col("o_custkey").as("t_cust"),
        col("o_orderstatus").as("t_status"), col("o_orderpriority").as("t_prio"))
      src.join(tgt, col("sk") === col("tk"), "full_outer")
        .withColumn("discrepancy_type",
          when(col("tk").isNull, lit("MISSING"))
            .when(col("sk").isNull, lit("EXTRA"))
            .when(col("s_cust") =!= col("t_cust") || col("s_status") =!= col("t_status") ||
                  col("s_prio") =!= col("t_prio"), lit("MODIFIED")))
        .filter(col("discrepancy_type").isNotNull)
        .select(coalesce(col("sk"), col("tk")).as("o_orderkey"), col("discrepancy_type"),
          concat_ws(",",
            when(col("s_cust") =!= col("t_cust"), lit("o_custkey")),
            when(col("s_status") =!= col("t_status"), lit("o_orderstatus")),
            when(col("s_prio") =!= col("t_prio"), lit("o_orderpriority"))).as("modified_columns"))
        .orderBy("o_orderkey")
    },

    "recon_repair" -> { (s, d) =>
      // ref: row_level/repair.py:19 generate_repair_script — emit the SQL
      // that would repair the target, as data (distributed string build).
      // Values are ''-escaped and identifiers quoted like the reference
      // (repair.py:184 value.replace("'","''"); repair.py:118 per-dialect
      // identifier quoting); MISSING rows get a quote injected into
      // o_orderpriority so the oracle exercises the escape path.
      def esc(c: Column): Column = regexp_replace(c, "'", "''")
      val src = Tables.orders(s, d).select(
        col("o_orderkey").as("sk"), col("o_custkey").as("s_cust"),
        col("o_orderstatus").as("s_status"),
        when(col("o_orderkey") % 97 === 0, concat(col("o_orderpriority"), lit("'Q")))
          .otherwise(col("o_orderpriority")).as("s_prio"))
      val tgt = target(s, d).select(
        col("o_orderkey").as("tk"), col("o_orderstatus").as("t_status"))
      src.join(tgt, col("sk") === col("tk"), "full_outer")
        .withColumn("repair_sql",
          when(col("tk").isNull, concat(
            lit("INSERT INTO \"orders\" (\"o_orderkey\", \"o_custkey\", \"o_orderstatus\", \"o_orderpriority\") VALUES ("),
            col("sk"), lit(", "), col("s_cust"), lit(", '"), esc(col("s_status")), lit("', '"),
            esc(col("s_prio")), lit("');")))
          .when(col("sk").isNull, concat(
            lit("DELETE FROM \"orders\" WHERE \"o_orderkey\" = "), col("tk"), lit(";")))
          .when(col("s_status") =!= col("t_status"), concat(
            lit("UPDATE \"orders\" SET \"o_orderstatus\" = '"), esc(col("s_status")),
            lit("' WHERE \"o_orderkey\" = "), col("sk"), lit(";"))))
        .filter(col("repair_sql").isNotNull)
        .select(coalesce(col("sk"), col("tk")).as("o_orderkey"), col("repair_sql"))
        .orderBy("o_orderkey")
    },

    "recon_report" -> { (s, d) =>
      // ref: report/generator.py — discrepancy rollup with severity
      // thresholds on the share of affected rows. The total stays a
      // (1-row) aggregate joined in, not a driver-side count().
      val total = Tables.orders(s, d).agg(count(lit(1)).as("total"))
      val src = Tables.orders(s, d).select(
        col("o_orderkey").as("sk"), col("o_orderstatus").as("s_status"))
      val tgt = target(s, d).select(
        col("o_orderkey").as("tk"), col("o_orderstatus").as("t_status"))
      src.join(tgt, col("sk") === col("tk"), "full_outer")
        .withColumn("discrepancy_type",
          when(col("tk").isNull, lit("MISSING"))
            .when(col("sk").isNull, lit("EXTRA"))
            .when(col("s_status") =!= col("t_status"), lit("MODIFIED")))
        .filter(col("discrepancy_type").isNotNull)
        .groupBy(col("discrepancy_type")).agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(total))
        .withColumn("severity",
          when(col("n") * 100 > col("total") * 5, lit("CRITICAL"))
            .when(col("n") * 100 > col("total"), lit("HIGH"))
            .when(col("n") * 1000 > col("total"), lit("MEDIUM"))
            .otherwise(lit("LOW")))
        .select("discrepancy_type", "n", "severity")
        .orderBy("discrepancy_type")
    },

    "recon_schema" -> { (s, d) =>
      // schema synchronization check (ref: the pipeline's automatic
      // schema creation + type mapping, utils/database_types.py):
      // canonical type names so SQL Server/Postgres/Spark spellings
      // compare equal.
      import s.implicits._
      def canonical(t: org.apache.spark.sql.types.DataType): String = t.simpleString match {
        case "bigint" | "int" => "integer"
        case "double" | "float" => "floating"
        case "string" => "text"
        case x if x.startsWith("timestamp") => "timestamp"
        case x => x
      }
      val fields = Tables.orders(s, d).schema.fields.toSeq
        .map(f => (f.name, canonical(f.dataType)))
      fields.toDF("column_name", "canonical_type")
        .withColumn("status", lit("MATCH"))
        .orderBy("column_name")
    },

    "recon_multi_table" -> { (s, d) =>
      // ref: parallel/reconciler.py:36 ParallelReconciler — the reference thread-pools one
      // connection per table; in Spark the per-table plans just union
      // into one job and the scheduler runs them partition-parallel.
      def side(df: DataFrame, name: String, row: Column) =
        df.agg(count(lit(1)).as("rows"), checksumAgg(row).as("ck"))
          .select(lit(name).as("table_name"), col("rows"), col("ck"))
      val srcs = Seq(
        side(Tables.orders(s, d), "orders", orowStr),
        side(Tables.customer(s, d), "customer",
          rowStr(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))),
        side(Tables.supplier(s, d), "supplier",
          rowStr(col("s_suppkey"), col("s_nationkey"))),
        side(Tables.nation(s, d), "nation",
          rowStr(col("n_nationkey"), col("n_name"), col("n_regionkey"))))
        .reduce(_ unionByName _)
      val tgts = Seq(
        side(target(s, d), "orders", orowStr),
        side(Tables.customer(s, d), "customer",
          rowStr(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))),
        side(Tables.supplier(s, d), "supplier",
          rowStr(col("s_suppkey"), col("s_nationkey"))),
        side(Tables.nation(s, d), "nation",
          rowStr(col("n_nationkey"), col("n_name"), col("n_regionkey"))))
        .reduce(_ unionByName _)
      srcs.as("s").join(tgts.as("t"), col("s.table_name") === col("t.table_name"))
        .select(col("s.table_name").as("table_name"),
          col("s.rows").as("source_rows"), col("t.rows").as("target_rows"),
          when(col("s.ck") === col("t.ck"), lit("MATCH")).otherwise(lit("MISMATCH")).as("status"))
        .orderBy("table_name")
    }
  )

  def oracles: Map[String, String] = Map(
    "recon_rowcount" ->
      s"""WITH s AS (SELECT COUNT(*) AS source_count FROM orders),
         |t AS (SELECT COUNT(*) AS target_count FROM ($TargetSql) x)
         |SELECT 'orders' AS table_name, source_count, target_count,
         |  target_count - source_count AS difference,
         |  CASE WHEN source_count = target_count THEN 'MATCH' ELSE 'MISMATCH' END AS status
         |FROM s, t""".stripMargin,

    "recon_checksum_agg" ->
      s"""WITH s AS (SELECT ${ckSql(orowSql)} AS source_checksum FROM orders),
         |t AS (SELECT ${ckSql(orowSql)} AS target_checksum FROM ($TargetSql) x)
         |SELECT 'orders' AS table_name, source_checksum, target_checksum,
         |  CASE WHEN source_checksum = target_checksum THEN 'MATCH' ELSE 'MISMATCH' END AS status
         |FROM s, t""".stripMargin,

    "recon_checksum_chunked" ->
      s"""WITH s AS (
         |  SELECT o_orderkey % 32 AS chunk, ${ckSql(orowSql)} AS sck, COUNT(*) AS source_rows
         |  FROM orders GROUP BY 1),
         |t AS (
         |  SELECT o_orderkey % 32 AS chunk, ${ckSql(orowSql)} AS tck, COUNT(*) AS target_rows
         |  FROM ($TargetSql) x GROUP BY 1)
         |SELECT s.chunk AS chunk, source_rows, target_rows,
         |  CASE WHEN sck = tck THEN 'MATCH' ELSE 'MISMATCH' END AS status
         |FROM s JOIN t ON s.chunk = t.chunk
         |ORDER BY chunk""".stripMargin,

    "recon_incremental" ->
      s"""WITH s AS (
         |  SELECT ${ckSql(orowSql)} AS sck, COUNT(*) AS source_rows FROM orders
         |  WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'),
         |t AS (
         |  SELECT ${ckSql(orowSql)} AS tck, COUNT(*) AS target_rows FROM ($TargetSql) x
         |  WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
         |SELECT source_rows, target_rows,
         |  CASE WHEN sck = tck THEN 'MATCH' ELSE 'MISMATCH' END AS status
         |FROM s, t""".stripMargin,

    "recon_rowlevel" ->
      s"""WITH src AS (SELECT o_orderkey AS sk, o_custkey AS s_cust,
         |    o_orderstatus AS s_status, o_orderpriority AS s_prio FROM orders),
         |tgt AS (SELECT o_orderkey AS tk, o_custkey AS t_cust,
         |    o_orderstatus AS t_status, o_orderpriority AS t_prio FROM ($TargetSql) x)
         |SELECT COALESCE(sk, tk) AS o_orderkey,
         |  CASE WHEN tk IS NULL THEN 'MISSING'
         |       WHEN sk IS NULL THEN 'EXTRA'
         |       WHEN s_cust <> t_cust OR s_status <> t_status OR s_prio <> t_prio
         |         THEN 'MODIFIED' END AS discrepancy_type,
         |  concat_ws(',',
         |    CASE WHEN s_cust <> t_cust THEN 'o_custkey' END,
         |    CASE WHEN s_status <> t_status THEN 'o_orderstatus' END,
         |    CASE WHEN s_prio <> t_prio THEN 'o_orderpriority' END) AS modified_columns
         |FROM src FULL OUTER JOIN tgt ON sk = tk
         |WHERE (CASE WHEN tk IS NULL THEN 'MISSING'
         |            WHEN sk IS NULL THEN 'EXTRA'
         |            WHEN s_cust <> t_cust OR s_status <> t_status OR s_prio <> t_prio
         |              THEN 'MODIFIED' END) IS NOT NULL
         |ORDER BY o_orderkey""".stripMargin,

    "recon_repair" ->
      s"""WITH src AS (SELECT o_orderkey AS sk, o_custkey AS s_cust,
         |    o_orderstatus AS s_status,
         |    CASE WHEN o_orderkey % 97 = 0 THEN o_orderpriority || '''Q'
         |         ELSE o_orderpriority END AS s_prio FROM orders),
         |tgt AS (SELECT o_orderkey AS tk, o_orderstatus AS t_status FROM ($TargetSql) x)
         |SELECT COALESCE(sk, tk) AS o_orderkey,
         |  CASE WHEN tk IS NULL THEN
         |    'INSERT INTO "orders" ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority") VALUES (' ||
         |    sk || ', ' || s_cust || ', ''' || replace(s_status, '''', '''''') ||
         |    ''', ''' || replace(s_prio, '''', '''''') || ''');'
         |  WHEN sk IS NULL THEN
         |    'DELETE FROM "orders" WHERE "o_orderkey" = ' || tk || ';'
         |  WHEN s_status <> t_status THEN
         |    'UPDATE "orders" SET "o_orderstatus" = ''' || replace(s_status, '''', '''''') ||
         |    ''' WHERE "o_orderkey" = ' || sk || ';' END AS repair_sql
         |FROM src FULL OUTER JOIN tgt ON sk = tk
         |WHERE (CASE WHEN tk IS NULL THEN 1 WHEN sk IS NULL THEN 1
         |            WHEN s_status <> t_status THEN 1 END) IS NOT NULL
         |ORDER BY o_orderkey""".stripMargin,

    "recon_report" ->
      s"""WITH src AS (SELECT o_orderkey AS sk, o_orderstatus AS s_status FROM orders),
         |tgt AS (SELECT o_orderkey AS tk, o_orderstatus AS t_status FROM ($TargetSql) x),
         |d AS (
         |  SELECT CASE WHEN tk IS NULL THEN 'MISSING'
         |              WHEN sk IS NULL THEN 'EXTRA'
         |              WHEN s_status <> t_status THEN 'MODIFIED' END AS discrepancy_type
         |  FROM src FULL OUTER JOIN tgt ON sk = tk),
         |tot AS (SELECT COUNT(*) AS total FROM orders)
         |SELECT discrepancy_type, COUNT(*) AS n,
         |  CASE WHEN COUNT(*) * 100 > MAX(total) * 5 THEN 'CRITICAL'
         |       WHEN COUNT(*) * 100 > MAX(total) THEN 'HIGH'
         |       WHEN COUNT(*) * 1000 > MAX(total) THEN 'MEDIUM'
         |       ELSE 'LOW' END AS severity
         |FROM d, tot WHERE discrepancy_type IS NOT NULL
         |GROUP BY discrepancy_type
         |ORDER BY discrepancy_type""".stripMargin,

    "recon_schema" ->
      """SELECT column_name,
        |  CASE WHEN column_type IN ('BIGINT', 'INTEGER') THEN 'integer'
        |       WHEN column_type IN ('DOUBLE', 'FLOAT') THEN 'floating'
        |       WHEN column_type = 'VARCHAR' THEN 'text'
        |       WHEN column_type LIKE 'TIMESTAMP%' THEN 'timestamp'
        |       ELSE lower(column_type) END AS canonical_type,
        |  'MATCH' AS status
        |FROM (DESCRIBE orders)
        |ORDER BY column_name""".stripMargin,

    "recon_multi_table" ->
      s"""WITH src AS (
         |  SELECT 'orders' AS table_name, COUNT(*) AS rows_, ${ckSql(orowSql)} AS ck FROM orders
         |  UNION ALL SELECT 'customer', COUNT(*),
         |    ${ckSql("concat_ws('|', CAST(c_custkey AS VARCHAR), CAST(c_nationkey AS VARCHAR), c_mktsegment)")}
         |    FROM customer
         |  UNION ALL SELECT 'supplier', COUNT(*),
         |    ${ckSql("concat_ws('|', CAST(s_suppkey AS VARCHAR), CAST(s_nationkey AS VARCHAR))")}
         |    FROM supplier
         |  UNION ALL SELECT 'nation', COUNT(*),
         |    ${ckSql("concat_ws('|', CAST(n_nationkey AS VARCHAR), n_name, CAST(n_regionkey AS VARCHAR))")}
         |    FROM nation),
         |tgt AS (
         |  SELECT 'orders' AS table_name, COUNT(*) AS rows_, ${ckSql(orowSql)} AS ck FROM ($TargetSql) x
         |  UNION ALL SELECT 'customer', COUNT(*),
         |    ${ckSql("concat_ws('|', CAST(c_custkey AS VARCHAR), CAST(c_nationkey AS VARCHAR), c_mktsegment)")}
         |    FROM customer
         |  UNION ALL SELECT 'supplier', COUNT(*),
         |    ${ckSql("concat_ws('|', CAST(s_suppkey AS VARCHAR), CAST(s_nationkey AS VARCHAR))")}
         |    FROM supplier
         |  UNION ALL SELECT 'nation', COUNT(*),
         |    ${ckSql("concat_ws('|', CAST(n_nationkey AS VARCHAR), n_name, CAST(n_regionkey AS VARCHAR))")}
         |    FROM nation)
         |SELECT src.table_name AS table_name, src.rows_ AS source_rows, tgt.rows_ AS target_rows,
         |  CASE WHEN src.ck = tgt.ck THEN 'MATCH' ELSE 'MISMATCH' END AS status
         |FROM src JOIN tgt ON src.table_name = tgt.table_name
         |ORDER BY table_name""".stripMargin
  )
}
