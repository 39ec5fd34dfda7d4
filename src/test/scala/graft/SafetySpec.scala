package graft

import graft.operators.SafetySuite

class SafetySpec extends SparkSpecBase {

  test("sql_identifier_safety accepts every real lake column name") {
    val rows = SafetySuite.queries("sql_identifier_safety")(spark, sf).collect()
    val byIdent = rows.map(r => r.getString(0) -> r).toMap
    graft.sources.Tables.orders(spark, sf).columns.foreach { c =>
      assert(byIdent(c).getBoolean(1), s"real column $c must validate")
    }
  }

  test("sql_identifier_safety rejects the injection/edge fixtures and quotes only valid ones") {
    val rows = SafetySuite.queries("sql_identifier_safety")(spark, sf).collect()
    val byIdent = rows.map(r => r.getString(0) -> r).toMap
    // (ident, valid, validAsSchemaTable)
    val expect = Seq(
      ("order-key", false, false), ("1abc", false, false), ("", false, false),
      ("drop table", false, false), ("a.b", false, true), ("a.b.c", false, false),
      ("séance", false, false), ("ok_ident", true, true), ("_lead", true, true),
      ("Robert'); DROP", false, false), ("col;", false, false),
      ("schema.tbl_2", false, true))
    expect.foreach { case (id, v, vst) =>
      val r = byIdent(id)
      assert(r.getBoolean(1) == v, s"$id is_valid")
      assert(r.getBoolean(2) == vst, s"$id is_valid_schema_table")
      if (v) {
        assert(r.getString(r.fieldIndex("quoted_pg")) == "\"" + id + "\"")
        assert(r.getString(r.fieldIndex("quoted_mssql")) == s"[$id]")
      } else {
        assert(r.isNullAt(r.fieldIndex("quoted_pg")), s"$id must not be quotable")
        assert(r.isNullAt(r.fieldIndex("quoted_mssql")))
      }
    }
  }

  test("recon_run_metrics rolls the multi-table run into one consistent record") {
    val r = SafetySuite.queries("recon_run_metrics")(spark, sf).collect().head
    val checked = r.getLong(r.fieldIndex("tables_checked"))
    val matched = r.getLong(r.fieldIndex("tables_matched"))
    val mism = r.getLong(r.fieldIndex("tables_mismatched"))
    assert(checked == 4L)
    assert(matched + mism == checked)
    assert(mism >= 1L, "the target fixture drifts orders — a mismatch must surface")
    val rate = r.getDouble(r.fieldIndex("match_rate6"))
    assert(rate >= 0.0 && rate <= 1.0)
    assert(math.abs(rate - matched.toDouble / checked) < 1e-5)
    assert(r.getLong(r.fieldIndex("source_rows_total")) > 0)
  }
}
