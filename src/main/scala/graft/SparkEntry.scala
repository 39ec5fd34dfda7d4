package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator suite's (queries, oracles). Suites live in
  * graft.operators.*; each §2 checklist line maps to one queries key.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AnalyticCore.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    AnalyticCore.queries ++ AnalyticExtra.queries ++ PiiSuite.queries ++ ReconSuite.queries ++
      CdcSuite.queries ++ graft.streaming.CdcStream.queries ++
      TextSuite.queries ++ DedupSuite.queries ++ AnnSuite.queries ++ LlmExtra.queries ++
      MultimodalSuite.queries ++ ExtendedSuite.queries ++ OpsSuite.queries ++
      SafetySuite.queries ++ CurationSuite.queries ++ GraphSuite.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    AnalyticCore.oracles ++ AnalyticExtra.oracles ++ PiiSuite.oracles ++ ReconSuite.oracles ++
      CdcSuite.oracles ++ graft.streaming.CdcStream.oracles ++
      TextSuite.oracles ++ DedupSuite.oracles ++ AnnSuite.oracles ++ LlmExtra.oracles ++
      MultimodalSuite.oracles ++ ExtendedSuite.oracles ++ OpsSuite.oracles ++
      SafetySuite.oracles ++ CurationSuite.oracles ++ GraphSuite.oracles
}
