package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native hash-membership stopword counter over an array of words:
  * equal to `size(filter(words, w -> w IN (stops)))` (and DuckDB's
  * `len(list_filter(ws, w -> w IN (...)))`) in one codegen'd loop with
  * an O(1) set probe per word.
  *
  * Why native: the composed form is doubly slow — Spark's higher-order
  * `filter` is CodegenFallback (boxed lambda steps + an intermediate
  * filtered array per row), and `w.isin(stops)` stays a chained
  * equality walk below the InSet conversion threshold, so the cost is
  * O(|words| · |stops|) interpreted comparisons per document. That
  * made text_quality the most expensive sf10 headline query (36.5 s —
  * pure narrow-stage CPU). Here the stopword set is a shared hash set
  * probed once per word inside whole-stage codegen, with no
  * intermediate array.
  *
  * Semantics matched exactly: duplicates in `words` each count (filter
  * keeps duplicates); null elements don't (null IN (...) is null, which
  * filter drops); an empty array counts 0; a null array is null.
  */
case class StopwordCount(child: Expression, stops: Seq[String])
  extends UnaryExpression with ExpectsInputTypes {

  require(stops.nonEmpty && stops.size <= 100000,
    s"stopword_count: stop list size out of range: ${stops.size}")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "stopword_count"

  // built per JVM on first use (UTF8String comparison avoids a decode
  // per probed word); transient so only the Seq rides task serialization
  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](stops.size * 2)
    stops.foreach(x => s.add(UTF8String.fromString(x)))
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i) && stopSet.contains(xs.getUTF8String(i))) cnt += 1
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the set is embedded by reference: built once per executor JVM,
    // shared by every generated-code instance of this expression
    val setRef = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n = $x.numElements();
         |int $cnt = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && $setRef.contains($x.getUTF8String($i))) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordCount =
    copy(child = newChild)
}
