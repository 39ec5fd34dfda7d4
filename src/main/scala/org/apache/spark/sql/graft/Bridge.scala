package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionColumnNode

/** Access bridge into Spark's `private[sql]` surface (the supported
  * library pattern — cf. public Spark extensions like Qbeast/Delta that
  * host a shim in an org.apache.spark.sql subpackage).
  *
  * Spark 4 Columns wrap ColumnNodes, not Expressions; ExpressionColumnNode
  * is the classic-session adapter.
  */
object Bridge {

  /** Wrap a raw Catalyst expression as a user-facing Column. */
  def columnOf(e: Expression): Column = new Column(ExpressionColumnNode(e))

  /** Unwrap a user-facing Column back to its Catalyst expression (the
    * inverse seam — Spark 4 removed the public Column.expr). Converted
    * EAGERLY: ExpressionUtils.expression wraps the ColumnNode lazily
    * (an opaque ColumnNodeExpression whose tree a collect can't walk),
    * while the converter yields the real Catalyst tree.
    */
  def expressionOf(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Register graft's native expressions on an existing session (the
    * runtime path; cluster deployments can instead set
    * spark.sql.extensions=graft.plans.GraftExtensions).
    */
  def register(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // idempotence guard: entries call register defensively (59 call
    // sites), so a session pays 59 × 11 re-registrations — each logging
    // "replaced a previously registered function" — without this. Keyed
    // on the LAST function below: its presence implies a prior call
    // completed the whole list (registration order is fixed; a
    // concurrent second caller merely re-runs the idempotent
    // createOrReplace calls).
    if (classic.sessionState.functionRegistry.functionExists(
      org.apache.spark.sql.catalyst.FunctionIdentifier("bpe_token_count")))
      return
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1)),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaccard_sim",
      (exprs: Seq[Expression]) => JaccardSimilarity(exprs(0), exprs(1)),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash60",
      (exprs: Seq[Expression]) => SimHash60(exprs(0)),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sigs",
      (exprs: Seq[Expression]) =>
        MinHashSigs(exprs(0), exprs(1).eval().asInstanceOf[Int]),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hash60_min",
      (exprs: Seq[Expression]) => Hash60Min(exprs(0)),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gram_hashes60",
      (exprs: Seq[Expression]) =>
        GramHashes60(exprs(0), exprs(1).eval().asInstanceOf[Int]),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "leven_band",
      (exprs: Seq[Expression]) =>
        LevenBand(exprs(0), exprs(1), exprs(2).eval().asInstanceOf[Int]),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "stopword_count",
      (exprs: Seq[Expression]) => StopwordCount(exprs(0), stringList(exprs(1), "stopword_count")),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "punct_count",
      (exprs: Seq[Expression]) => PunctCount(exprs(0)),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nearest_centroid",
      (exprs: Seq[Expression]) => NearestCentroid(exprs(0), exprs(1)),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_token_count",
      (exprs: Seq[Expression]) => BpeTokenCount(exprs(0)),
      "built-in")
  }

  /** Evaluate a foldable array-of-strings argument (e.g.
    * `array('the','a')`) into the Scala list a construction-time
    * parameter needs. A non-foldable or wrong-typed argument surfaces
    * as a proper AnalysisException (NON_FOLDABLE_ARGUMENT, the standard
    * error class) naming the calling function — not as an
    * internal-looking require/ClassCastException at plan time.
    */
  def stringList(e: Expression, funcName: String): Seq[String] = {
    def fail(): Nothing = throw new org.apache.spark.sql.AnalysisException(
      "NON_FOLDABLE_ARGUMENT",
      Map("funcName" -> s"`$funcName`", "paramName" -> "`words`",
        "paramType" -> "\"ARRAY<STRING>\""))
    if (!e.foldable) fail()
    val xs = e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData => a
      case _ => fail()
    }
    try (0 until xs.numElements()).map(i => xs.getUTF8String(i).toString)
    catch { case _: ClassCastException | _: NullPointerException => fail() }
  }
}
