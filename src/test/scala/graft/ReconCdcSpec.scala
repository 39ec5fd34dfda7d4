package graft

import graft.operators.{CdcSuite, ReconSuite}
import graft.streaming.CdcStream

class ReconCdcSpec extends SparkSpecBase {

  test("rowcount compare reports the engineered drift") {
    val r = ReconSuite.queries("recon_rowcount")(spark, sf).collect().head
    assert(r.getAs[String]("status") == "MISMATCH")
    // target drops %97 keys and adds %101 copies — never equal for our data
    assert(r.getAs[Long]("difference") != 0)
  }

  test("aggregate checksum flags the mismatch; chunked localizes it") {
    val agg = ReconSuite.queries("recon_checksum_agg")(spark, sf).collect().head
    assert(agg.getAs[String]("status") == "MISMATCH")
    val chunks = ReconSuite.queries("recon_checksum_chunked")(spark, sf).collect()
    assert(chunks.length == 32)
    assert(chunks.exists(_.getAs[String]("status") == "MISMATCH"))
    assert(chunks.exists(_.getAs[String]("status") == "MATCH"),
      "perturbation touches some chunks, not all — chunking must localize")
  }

  test("row-level diff classifies all three discrepancy kinds consistently with the moduli") {
    val rows = ReconSuite.queries("recon_rowlevel")(spark, sf).collect()
    val byType = rows.groupBy(_.getAs[String]("discrepancy_type")).view.mapValues(_.length).toMap
    assert(byType.keySet == Set("MISSING", "EXTRA", "MODIFIED"))
    rows.foreach { r =>
      val k = r.getAs[Long]("o_orderkey")
      r.getAs[String]("discrepancy_type") match {
        case "MISSING"  => assert(k % 97 == 0)
        case "EXTRA"    => assert(k >= 100000000L && (k - 100000000L) % 101 == 0)
        case "MODIFIED" => assert(k % 89 == 0)
      }
    }
  }

  test("repair SQL covers every discrepancy with the right verb") {
    val rows = ReconSuite.queries("recon_repair")(spark, sf).collect()
    rows.foreach { r =>
      val sql = r.getAs[String]("repair_sql")
      val k = r.getAs[Long]("o_orderkey")
      if (k < 100000000L && k % 97 == 0) assert(sql.startsWith("INSERT"))
      else if (k >= 100000000L) assert(sql.startsWith("DELETE"))
      else assert(sql.startsWith("UPDATE"))
    }
  }

  test("multi-table recon: only orders drifts") {
    val rows = ReconSuite.queries("recon_multi_table")(spark, sf).collect()
    rows.foreach { r =>
      val expected = if (r.getAs[String]("table_name") == "orders") "MISMATCH" else "MATCH"
      assert(r.getAs[String]("status") == expected)
    }
  }

  test("cdc apply: deletes gone, updates applied, inserts kept") {
    val state = CdcSuite.queries("cdc_apply_latest")(spark, sf).collect()
    assert(state.nonEmpty)
    state.foreach { r =>
      val id = r.getAs[Long]("id")
      assert(id % 13 != 0, "deleted keys must not survive")
      if (id % 7 == 0) assert(r.getAs[String]("status") == "U")
      else assert(r.getAs[String]("status") != "U")
    }
  }

  test("streaming apply equals batch apply exactly") {
    val batch = CdcSuite.queries("cdc_apply_latest")(spark, sf).collect().map(_.toSeq)
    val stream = CdcStream.queries("cdc_stream_apply")(spark, sf).collect().map(_.toSeq)
    assert(stream.sameElements(batch))
  }

  test("streaming windowed counts equal the batch group-by") {
    val stream = CdcStream.queries("stream_windowed_agg")(spark, sf).collect()
      .map(r => (r.get(0).toString, r.getAs[String]("event_type")) -> r.getAs[Long]("n")).toMap
    val batch = graft.sources.Tables.events(spark, sf)
      .groupBy(org.apache.spark.sql.functions.date_trunc("hour",
        org.apache.spark.sql.functions.col("ts")).as("w"),
        org.apache.spark.sql.functions.col("event_type"))
      .count().collect()
      .map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(stream == batch)
  }
}
