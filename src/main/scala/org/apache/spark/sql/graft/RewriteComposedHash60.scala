package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite the composed min-of-md5-60 pattern
  *
  *   array_min(transform(xs, x ->
  *     CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)))
  *
  * into the fused [[Hash60Min]] expression. This is graft's canonical
  * 1-perm MinHash idiom (CLAUDE.md's engine-portability contract), so
  * SQL users writing it longhand silently get the codegen'd
  * no-allocation loop instead of a CodegenFallback higher-order
  * function. Semantics-preserving: identical per-element arithmetic;
  * null elements are skipped on both sides (md5(NULL) is null and
  * array_min ignores nulls; Hash60Min skips isNullAt slots); an empty
  * or all-null array yields null either way.
  *
  * Registered via graft.plans.GraftExtensions (injectOptimizerRule).
  */
object RewriteComposedHash60 extends Rule[LogicalPlan] {

  /** Matches `CAST(conv(substr(md5(x),1,15),16,10) AS BIGINT)` applied
    * to the lambda variable, tolerating the analyzer's implicit
    * binary/string casts around the md5 argument.
    */
  private def isHash60OfVar(e: Expression, v: NamedExpression): Boolean = e match {
    case Cast(Conv(Substring(Md5(inner), Literal(1, IntegerType), Literal(15, IntegerType)),
        Literal(16, IntegerType), Literal(10, IntegerType), _), LongType, _, _) =>
      inner match {
        case Cast(x, BinaryType, _, _) => x.semanticEquals(v)
        case x => x.semanticEquals(v)
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayMin(ArrayTransform(xs, LambdaFunction(body, Seq(v: NamedExpression), _)))
        if xs.dataType.isInstanceOf[ArrayType] &&
          xs.dataType.asInstanceOf[ArrayType].elementType == StringType &&
          isHash60OfVar(body, v) =>
      Hash60Min(xs)
  }
}
