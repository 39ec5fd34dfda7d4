package graft

import org.apache.spark.sql.functions._

/** stopword_count must be bit-equal to the composed
  * `size(filter(words, w -> w.isin(stops)))` it replaces in
  * text_quality — on fixture documents, duplicate stopwords, null
  * elements, empty arrays, and null arrays — while running as an O(1)
  * hash probe per word inside whole-stage codegen.
  */
class StopwordCountSpec extends SparkSpecBase {

  private val Stops = Seq("the", "a", "and", "of", "to")
  private val StopsSql = Stops.map(w => s"'$w'").mkString(", ")

  private def bothWays(df: org.apache.spark.sql.DataFrame): Unit = {
    org.apache.spark.sql.graft.Bridge.register(spark)
    val out = df
      .withColumn("composed", size(filter(col("words"), w => w.isin(Stops: _*))))
      .withColumn("native", expr(s"stopword_count(words, array($StopsSql))"))
    val diff = out.filter(!(col("composed") <=> col("native"))).collect()
    assert(diff.isEmpty, s"diverged: ${diff.take(5).mkString("; ")}")
  }

  test("equal to the composed form on fixture documents") {
    // CODEGEN_ONLY: a doGenCode bug would otherwise fall back to
    // interpreted eval silently and the equality would pass vacuously
    withConfs("spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY") {
      bothWays(graft.sources.Tables.documents(spark, sf)
      .withColumn("words", split(col("text"), " ")))
    }
  }

  test("duplicates each count; null elements and empties don't") {
    val s = spark
    import s.implicits._
    bothWays(Seq(
      Seq("the", "the", "the", "cat"),           // duplicate stopwords
      Seq("cat", "dog"),                         // none
      Seq.empty[String],                         // empty array -> 0
      Seq("THE", "The", "the"),                  // case-sensitive: 1
      Seq("a", "of", "to", "and", "the")         // all five
    ).toDF("words"))
    // null elements are dropped by both forms; a null array is null
    val withNulls = s.sql(
      s"""SELECT * FROM VALUES
         |  (array('the', CAST(NULL AS STRING), 'a')),
         |  (CAST(NULL AS ARRAY<STRING>))
         |AS t(words)""".stripMargin)
    bothWays(withNulls)
  }

  test("interpreted eval path matches a hand computation") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    val arr = new GenericArrayData(
      Array[Any](UTF8String.fromString("the"), UTF8String.fromString("cat"),
        UTF8String.fromString("the")))
    val e = org.apache.spark.sql.graft.StopwordCount(
      Literal.create(arr, ArrayType(StringType)), Stops)
    assert(e.eval(null) == 2)
  }
}
