package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: `--conf
  * spark.sql.extensions=graft.plans.GraftExtensions` makes graft's native
  * expressions available to every session on the cluster, including pure
  * SQL users.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("jaccard_sim"),
      new ExpressionInfo(classOf[JaccardSimilarity].getName, "jaccard_sim"),
      (exprs: Seq[Expression]) => JaccardSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[JaccardSimilarity].getName.replace("JaccardSimilarity", "SimHash60"), "simhash60"),
      (exprs: Seq[Expression]) => org.apache.spark.sql.graft.SimHash60(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.graft.MinHashSigs].getName, "minhash_sigs"),
      (exprs: Seq[Expression]) => org.apache.spark.sql.graft.MinHashSigs(
        exprs(0), exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("hash60_min"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.graft.Hash60Min].getName, "hash60_min"),
      (exprs: Seq[Expression]) => org.apache.spark.sql.graft.Hash60Min(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("gram_hashes60"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.graft.GramHashes60].getName, "gram_hashes60"),
      (exprs: Seq[Expression]) => org.apache.spark.sql.graft.GramHashes60(
        exprs(0), exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("leven_band"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.graft.LevenBand].getName, "leven_band"),
      (exprs: Seq[Expression]) => org.apache.spark.sql.graft.LevenBand(
        exprs(0), exprs(1), exprs(2).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("stopword_count"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.graft.StopwordCount].getName, "stopword_count"),
      (exprs: Seq[Expression]) => org.apache.spark.sql.graft.StopwordCount(
        exprs(0),
        org.apache.spark.sql.graft.Bridge.stringList(exprs(1), "stopword_count"))))
    ext.injectFunction((
      FunctionIdentifier("punct_count"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.graft.PunctCount].getName, "punct_count"),
      (exprs: Seq[Expression]) => org.apache.spark.sql.graft.PunctCount(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("nearest_centroid"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.graft.NearestCentroid].getName, "nearest_centroid"),
      (exprs: Seq[Expression]) => org.apache.spark.sql.graft.NearestCentroid(
        exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("bpe_token_count"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.graft.BpeTokenCount].getName, "bpe_token_count"),
      (exprs: Seq[Expression]) => org.apache.spark.sql.graft.BpeTokenCount(exprs(0))))
    // composed size(intersect)/size(union) → fused JaccardSimilarity
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graft.RewriteComposedJaccard)
    // composed array_min(transform(xs, md5-60)) → fused Hash60Min
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graft.RewriteComposedHash60)
    // composed size(regexp_extract_all(x, '[^A-Za-z0-9 ]', 0)) → fused
    // PunctCount byte-loop
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graft.RewriteComposedPunct)
    // AsofJoin logical node → AsofJoinExec (GraftAsof.asofJoin also
    // self-registers this per-session for API users without the conf)
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.AsofJoinStrategy)
  }
}
