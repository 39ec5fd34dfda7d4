package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native fused min-of-md5-60 over an array of strings: the
  * 1-permutation MinHash used by text_fingerprint's `fp_minhash1`.
  * Equal to `array_min(transform(xs, x -> conv(substr(md5(x),1,15),16,10)))`
  * (and its DuckDB mirror) in one codegen'd loop — the composed
  * higher-order-function form is CodegenFallback and allocates an
  * intermediate hash array per row. Returns null on an empty array
  * (matching array_min of an empty transform). Null elements are
  * SKIPPED — md5(NULL) is null and array_min ignores nulls in the
  * composed form, so an all-null array also yields null.
  */
case class Hash60Min(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  // null on an empty array even when the input is non-nullable
  override def nullable: Boolean = true
  override def prettyName: String = "hash60_min"

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    var min = Long.MaxValue
    var seen = false
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) {
        val h = MinHashSigs.hash60(xs.getUTF8String(i).getBytes)
        if (h < min) min = h
        seen = true
      }
      i += 1
    }
    if (seen) min else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val min = ctx.freshName("min")
      val seen = ctx.freshName("seen")
      s"""
         |int $n = $x.numElements();
         |long $min = Long.MAX_VALUE;
         |boolean $seen = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i)) {
         |    long $h = org.apache.spark.sql.graft.MinHashSigs.hash60(
         |      $x.getUTF8String($i).getBytes());
         |    if ($h < $min) $min = $h;
         |    $seen = true;
         |  }
         |}
         |if ($seen) {
         |  ${ev.value} = $min;
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Hash60Min =
    copy(child = newChild)
}
