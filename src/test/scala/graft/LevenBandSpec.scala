package graft

import org.apache.spark.sql.functions._

/** leven_band must be bit-equal to Spark's levenshtein(a, b, threshold)
  * — distance when ≤ k, -1 beyond — on every input class: fixture text,
  * random edit chains, the threshold boundary, unicode (codepoint
  * semantics, not bytes), empties, and nulls.
  */
class LevenBandSpec extends SparkSpecBase {

  private def bothWays(pairs: Seq[(String, String)], k: Int): Unit = {
    val s = spark
    import s.implicits._
    org.apache.spark.sql.graft.Bridge.register(s)
    val df = pairs.toDF("a", "b")
      .withColumn("builtin", levenshtein(col("a"), col("b"), k))
      .withColumn("native", expr(s"leven_band(a, b, $k)"))
    val diff = df.filter(col("builtin") =!= col("native")).collect()
    assert(diff.isEmpty, s"diverged: ${diff.take(5).mkString("; ")}")
  }

  test("equal to the builtin on fixture documents") {
    val s = spark
    import s.implicits._
    org.apache.spark.sql.graft.Bridge.register(s)
    val docs = graft.sources.Tables.documents(s, sf).select("text").limit(200)
      .collect().map(_.getString(0))
    val pairs = docs.sliding(2).collect { case Array(a, b) => (a, b) }.toSeq ++
      docs.take(20).map(t => (t, t))
    bothWays(pairs, 30)
  }

  test("equal on random edit chains across the threshold boundary") {
    val rnd = new scala.util.Random(42)
    val base = "the quick brown fox jumps over the lazy dog and then some more text"
    val pairs = (0 until 200).map { i =>
      val edits = i % 50
      var t = base
      (0 until edits).foreach { _ =>
        val p = rnd.nextInt(t.length)
        rnd.nextInt(3) match {
          case 0 => t = t.substring(0, p) + "x" + t.substring(p)           // insert
          case 1 if t.length > 1 => t = t.substring(0, p) + t.substring(math.min(p + 1, t.length)) // delete
          case _ => t = t.updated(p, 'z')                                  // substitute
        }
      }
      (base, t)
    }
    bothWays(pairs, 20) // many chains land exactly at/around k=20
  }

  test("unicode: codepoints, not bytes") {
    bothWays(Seq(
      ("héllo wörld", "hello world"),
      ("日本語テキスト", "日本語テスト"),
      ("emoji 😀 test", "emoji 😀 tost"),
      ("ascii", "日本語"),
      ("", "日本語テキスト")
    ), 10)
  }

  test("edge cases: empty, equal, way beyond threshold") {
    bothWays(Seq(
      ("", ""), ("", "abc"), ("abc", ""), ("same", "same"),
      ("a" * 200, "b" * 200), ("short", "a" * 100)
    ), 5)
  }

  test("nulls propagate") {
    val s = spark
    import s.implicits._
    org.apache.spark.sql.graft.Bridge.register(s)
    val df = Seq((Some("a"), None: Option[String]), (None, Some("b")), (None, None))
      .toDF("a", "b")
      .withColumn("native", expr("leven_band(a, b, 5)"))
    assert(df.filter(col("native").isNotNull).count() == 0)
  }

  test("interpreted eval agrees with codegen") {
    // nullSafeEval path (e.g. under ConstantFolding) must match doGenCode
    val e = org.apache.spark.sql.graft.LevenBand(
      org.apache.spark.sql.catalyst.expressions.Literal("kitten"),
      org.apache.spark.sql.catalyst.expressions.Literal("sitting"), 5)
    assert(e.eval(null) == 3)
    val far = org.apache.spark.sql.graft.LevenBand(
      org.apache.spark.sql.catalyst.expressions.Literal("abcdefghij"),
      org.apache.spark.sql.catalyst.expressions.Literal("zzzzzzzzzz"), 5)
    assert(far.eval(null) == -1)
  }
}
