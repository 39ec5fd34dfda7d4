package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.graft.{AsofJoinStrategy, RewriteComposedHash60, RewriteComposedJaccard, RewriteComposedPunct}

/** The cluster-wide wiring path (`spark.sql.extensions=
  * graft.plans.GraftExtensions`): every native component must be
  * injected so a pure-SQL user gets the full surface without touching
  * the Scala API.
  */
class ExtensionsSpec extends SparkSpecBase {

  private def built: SparkSessionExtensions = {
    val ext = new SparkSessionExtensions
    new graft.plans.GraftExtensions()(ext)
    ext
  }

  test("extensions inject all native functions") {
    val reg = org.apache.spark.sql.graft.ExtensionsProbe.functions(built)
    Seq("cosine_sim", "jaccard_sim", "simhash60", "minhash_sigs",
      "hash60_min", "gram_hashes60", "leven_band", "stopword_count",
      "punct_count", "nearest_centroid", "bpe_token_count").foreach { fn =>
      assert(reg.functionExists(FunctionIdentifier(fn)), s"$fn must be registered")
    }
  }

  test("extensions inject the rewrite rules and the asof strategy") {
    import org.apache.spark.sql.graft.ExtensionsProbe
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rules = ExtensionsProbe.optimizerRules(built, classic)
    assert(rules.contains(RewriteComposedJaccard))
    assert(rules.contains(RewriteComposedHash60))
    assert(rules.contains(RewriteComposedPunct))
    assert(ExtensionsProbe.strategies(built, classic).contains(AsofJoinStrategy))
  }
}
