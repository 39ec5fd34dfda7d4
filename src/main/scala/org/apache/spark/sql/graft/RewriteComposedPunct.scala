package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite the composed punctuation-count pattern
  *
  *   size(regexp_extract_all(text, '[^A-Za-z0-9 ]', 0))
  *
  * into the fused [[PunctCount]] byte-loop. This is the quality-score
  * idiom every text pipeline writes (and the profiled hot path of
  * text_quality before the native form), so SQL users writing it
  * longhand silently drop the per-character regex engine.
  * Semantics-preserving: the char class matches exactly one codepoint
  * outside [A-Za-z0-9 ], so the match count equals PunctCount's
  * codepoint count; a null subject yields null either way — the
  * rewrite is therefore suppressed under the legacy size-of-null
  * behavior (size(NULL) = -1) unless the subject is non-nullable.
  *
  * Registered via graft.plans.GraftExtensions (injectOptimizerRule).
  */
object RewriteComposedPunct extends Rule[LogicalPlan] {

  private val PunctClass = "[^A-Za-z0-9 ]"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(RegExpExtractAll(subject,
        Literal(pat: UTF8String, StringType), Literal(0, IntegerType)), legacySizeOfNull)
        if pat.toString == PunctClass && subject.dataType == StringType &&
          (!legacySizeOfNull || !subject.nullable) =>
      PunctCount(subject)
  }
}
