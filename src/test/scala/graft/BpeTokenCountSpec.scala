package graft

import org.apache.spark.sql.functions._

/** bpe_token_count must be bit-equal to
  * `size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0))`
  * — the text_tokens BPE-ish pattern — on fixture documents and on the
  * inputs that stress the closed-form reduction: run boundaries,
  * letter/digit transitions, multi-byte codepoints splitting runs,
  * astral-plane codepoints, spaces, empties, and nulls.
  */
class BpeTokenCountSpec extends SparkSpecBase {

  private val Pat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  private def bothWays(df: org.apache.spark.sql.DataFrame): Unit = {
    org.apache.spark.sql.graft.Bridge.register(spark)
    val out = df
      .withColumn("composed",
        size(regexp_extract_all(col("text"), lit(Pat), lit(0))))
      .withColumn("native", expr("bpe_token_count(text)"))
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

  test("run boundaries, transitions, unicode, and edge inputs") {
    val s = spark
    import s.implicits._
    bothWays(Seq(
      "hello world 123",          // 2 letter runs + 1 digit run
      "abc123def",                // letter/digit transitions: 3 tokens
      "a1b2c3",                   // alternating: 6
      "!!!",                      // 3 single punct
      "a-b-c",                    // runs split by punct: 5
      "",                         // empty -> 0
      "   ",                      // spaces only -> 0
      "ab日cd",                   // kanji splits the letter run: 3
      "日本語",                    // 3 other codepoints
      "emoji 🦊42fox",            // astral codepoint between tokens
      "tab\there",                // control char is a token
      "MiXeD CaSe RUNS"           // case doesn't split runs
    ).toDF("text"))
    bothWays(s.sql("SELECT CAST(NULL AS STRING) AS text"))
  }

  test("interpreted eval path matches a hand computation") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = org.apache.spark.sql.graft.BpeTokenCount(Literal("ab日cd 12!"))
    assert(e.eval(null) == 5) // "ab", 日, "cd", "12", "!"
  }
}
