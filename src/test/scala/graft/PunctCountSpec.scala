package graft

import org.apache.spark.sql.functions._

/** punct_count must be bit-equal to the regex form it replaces in
  * text_quality — `size(regexp_extract_all(text, '[^A-Za-z0-9 ]', 0))`
  * — on fixture documents, multi-byte UTF-8 (each non-ASCII codepoint
  * counts exactly once, including astral-plane ones), empties, and
  * nulls, while running as one byte-loop instead of a per-char regex.
  */
class PunctCountSpec extends SparkSpecBase {

  private def bothWays(df: org.apache.spark.sql.DataFrame): Unit = {
    org.apache.spark.sql.graft.Bridge.register(spark)
    val out = df
      .withColumn("composed",
        size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9 ]"), lit(0))))
      .withColumn("native", expr("punct_count(text)"))
    val diff = out.filter(!(col("composed") <=> col("native"))).collect()
    assert(diff.isEmpty, s"diverged: ${diff.take(5).mkString("; ")}")
  }

  test("equal to the regex form on fixture documents") {
    // CODEGEN_ONLY: a doGenCode bug would otherwise fall back to
    // interpreted eval silently and the equality would pass vacuously
    withConfs("spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY") {
      bothWays(graft.sources.Tables.documents(spark, sf).select("text"))
    }
  }

  test("unicode, empties, and edge characters") {
    val s = spark
    import s.implicits._
    bothWays(Seq(
      "plain ascii words 123",
      "punct! lots?? of... it;:",
      "",                                  // empty -> 0
      "héllo wörld",                       // latin-1 supplements: 2
      "日本語テキスト",                      // all non-ascii, no spaces
      "emoji 🦊 fox",            // astral codepoint counts once
      "tabs\tand\nnewlines",               // control chars are punct
      "   ",                               // spaces only -> 0
      "a-b_c.d"                            // ascii punctuation
    ).toDF("text"))
    // null propagates
    val withNull = s.sql("SELECT CAST(NULL AS STRING) AS text")
    bothWays(withNull)
  }

  test("interpreted eval path matches a hand computation") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = org.apache.spark.sql.graft.PunctCount(Literal("a!b 日x"))
    assert(e.eval(null) == 2) // '!' and the kanji
  }

  test("optimizer rule fuses the composed punct-count pattern") {
    import org.apache.spark.sql.graft.RewriteComposedPunct
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.experimental.extraOptimizations =
      classic.experimental.extraOptimizations :+ RewriteComposedPunct
    try {
      val composed = graft.sources.Tables.documents(spark, sf).limit(50)
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9 ]"), lit(0))).as("n"))
      val plan = composed.queryExecution.optimizedPlan.toString
      assert(plan.contains("punct_count"), s"rule did not fire:\n$plan")
      // the rewritten plan computes the same values as the un-rewritten
      // regex form (evaluated through the native expression directly)
      org.apache.spark.sql.graft.Bridge.register(spark)
      val direct = graft.sources.Tables.documents(spark, sf).limit(50)
        .select(col("doc_id"), expr("punct_count(text)").as("n"))
      assert(composed.collect().map(_.toString).toSeq ===
        direct.collect().map(_.toString).toSeq)
      // a DIFFERENT char class must not rewrite
      val other = graft.sources.Tables.documents(spark, sf).limit(5)
        .select(size(regexp_extract_all(col("text"), lit("[^a-z ]"), lit(0))).as("n"))
      assert(!other.queryExecution.optimizedPlan.toString.contains("punct_count"))
    } finally {
      classic.experimental.extraOptimizations =
        classic.experimental.extraOptimizations.filterNot(_ == RewriteComposedPunct)
    }
  }
}
