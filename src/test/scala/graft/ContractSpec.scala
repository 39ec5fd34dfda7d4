package graft

/** Guards the driver contract itself against drift. */
class ContractSpec extends SparkSpecBase {

  private val rowsOnly = Set("q_approx_distinct", "plan_advisor")
  private val streaming = Set("cdc_stream_apply", "stream_windowed_agg", "stream_dedup_exact")

  test("every query is oracle-checked or a documented rows-only op") {
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet -- rowsOnly,
      s"undocumented rows-only: ${SparkEntry.queries.keySet -- rowsOnly -- SparkEntry.oracleSql.keySet}; " +
        s"orphan oracles: ${SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet}")
  }

  test("result schemas: lowercase, distinct, no spark-illegal column names") {
    SparkEntry.queries.filterNot(q => streaming(q._1)).foreach { case (name, fn) =>
      val cols = fn(spark, sf).schema.fieldNames
      assert(cols.distinct.length == cols.length, s"$name has duplicate columns")
      cols.foreach { c =>
        assert(c == c.toLowerCase || c == "__deleted",
          s"$name column '$c' is not lowercase (driver sorts/hashes by name)")
      }
    }
  }

  test("shuffle budget covers exactly the headline bench set") {
    // the deterministic regression gate only guards queries with a
    // budget line — a headline addition without one would silently go
    // ungated, and a stale line would flag a ghost
    val budget = scala.io.Source.fromFile("/root/repo/bench/shuffle_budget.txt", "UTF-8")
      .getLines().map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map(_.split("\\s+")(0)).toSet
    val headline = Bench.Headline.toSet
    assert(budget == headline,
      s"unbudgeted headline: ${headline -- budget}; stale budget lines: ${budget -- headline}")
    assert(headline.subsetOf(SparkEntry.queries.keySet))
  }

  test("oracle SQL mentions every output column name of its query") {
    // cheap guard for alias drift: each Spark column name should appear
    // verbatim in the oracle text (as alias or source column)
    SparkEntry.oracleSql.filterNot(q => streaming(q._1)).foreach { case (name, sql) =>
      val cols = SparkEntry.queries(name)(spark, sf).schema.fieldNames
      cols.foreach { c =>
        assert(sql.toLowerCase.contains(c.toLowerCase),
          s"$name: column '$c' not found in oracle SQL")
      }
    }
  }
}
