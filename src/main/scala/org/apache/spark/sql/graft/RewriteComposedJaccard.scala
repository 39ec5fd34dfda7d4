package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}

/** Optimizer rule: rewrite the composed set-Jaccard pattern
  *
  *   CAST(size(array_intersect(a, b)) AS DOUBLE) / size(array_union(a, b))
  *
  * into the fused [[JaccardSimilarity]] expression. Semantics-preserving
  * for any string arrays: intersect/union both collapse duplicates (set
  * semantics, like the hash sets), nulls propagate identically, and the
  * empty/empty case is NaN either way — so user queries written in the
  * composed style silently get the no-allocation fused loop.
  *
  * Registered via graft.plans.GraftExtensions (injectOptimizerRule) or
  * `spark.experimental.extraOptimizations`.
  */
object RewriteComposedJaccard extends Rule[LogicalPlan] {

  private def isStrArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // the division analyzes to cast(size(..) as double) / cast(size(..)
    // as double) — the denominator cast is implicit
    case Divide(
          Cast(Size(ArrayIntersect(a, b), _), DoubleType, _, _),
          Cast(Size(ArrayUnion(a2, b2), _), DoubleType, _, _), _)
        if a.semanticEquals(a2) && b.semanticEquals(b2) &&
          isStrArray(a) && isStrArray(b) =>
      JaccardSimilarity(a, b)
  }
}
