package graft

import graft.sources.CdcSink

/** Contract spec for the sink half of the I/O seam (no live DB): the
  * constructed JDBC writer and the dialect upsert/delete templates the
  * reference connector would execute (postgresql-sink.json:
  * insert.mode=upsert, pk.mode=record_value, delete rewrite).
  */
class CdcSinkSpec extends SparkSpecBase {

  test("jdbcAppendWriter constructs with the batching contract, no connection") {
    val df = spark.range(3).selectExpr("id", "CAST(id AS STRING) AS v")
    val w = CdcSink.jdbcAppendWriter(df, "jdbc:postgresql://db:5432/t", "orders",
      user = "writer", batchSize = 3000, numPartitions = 10)
    assert(w != null) // save() would connect; construction must not
  }

  test("postgres upsert template is the connector's ON CONFLICT form") {
    val sql = CdcSink.upsertTemplate("orders", Seq("id", "custkey", "status"), Seq("id"))
    assert(sql ==
      """INSERT INTO "orders" ("id", "custkey", "status") VALUES (?, ?, ?)""" +
      """ ON CONFLICT ("id") DO UPDATE SET "custkey" = EXCLUDED."custkey",""" +
      """ "status" = EXCLUDED."status";""")
  }

  test("sqlserver upsert template is a keyed MERGE") {
    val sql = CdcSink.upsertTemplate("orders", Seq("id", "status"), Seq("id"), "sqlserver")
    assert(sql.startsWith("MERGE INTO [orders] t USING (VALUES (?, ?)) s ([id], [status]) ON t.[id] = s.[id]"))
    assert(sql.contains("WHEN MATCHED THEN UPDATE SET t.[status] = s.[status]"))
    assert(sql.contains("WHEN NOT MATCHED THEN INSERT ([id], [status]) VALUES (s.[id], s.[status]);"))
  }

  test("embedded quote chars in identifiers are escaped by doubling") {
    // a hostile or odd column name must not break out of the quoted
    // identifier in generated statements
    val pg = CdcSink.upsertTemplate("""or"ders""", Seq("""i"d""", "v"), Seq("""i"d"""))
    assert(pg.contains("\"or\"\"ders\"") && pg.contains("\"i\"\"d\""))
    assert(!pg.contains("\"or\"ders\""))
    val ms = CdcSink.upsertTemplate("or]ders", Seq("i]d", "v"), Seq("i]d"), "sqlserver")
    assert(ms.contains("[or]]ders]") && ms.contains("[i]]d]"))
  }

  test("composite keys thread through both templates") {
    val up = CdcSink.upsertTemplate("li", Seq("ok", "ln", "qty"), Seq("ok", "ln"))
    assert(up.contains("""ON CONFLICT ("ok", "ln")"""))
    assert(up.endsWith("""DO UPDATE SET "qty" = EXCLUDED."qty";"""))
    val del = CdcSink.deleteTemplate("li", Seq("ok", "ln"))
    assert(del == """DELETE FROM "li" WHERE "ok" = ? AND "ln" = ?;""")
  }

  test("key columns must be a subset of the columns") {
    intercept[IllegalArgumentException] {
      CdcSink.upsertTemplate("t", Seq("a", "b"), Seq("missing"))
    }
  }

  test("upsert script compacts to one statement per key and matches ops") {
    val rows = graft.operators.CdcSuite.queries("cdc_sink_upsert_script")(spark, sf).collect()
    val state = graft.operators.CdcSuite.queries("cdc_apply_latest")(spark, sf).collect()
    val deletes = rows.count(_.getAs[String]("stmt").startsWith("DELETE"))
    val upserts = rows.count(_.getAs[String]("stmt").startsWith("INSERT"))
    assert(upserts == state.length, "one upsert per surviving key")
    assert(deletes > 0 && deletes + upserts == rows.length)
    assert(rows.map(_.getAs[Long]("id")).distinct.length == rows.length,
      "compaction left duplicate keys")
  }
}
