package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd set-Jaccard over two string-array columns.
  *
  * Replaces `size(array_intersect(a,b)) / size(array_union(a,b))` in the
  * dedup verification hot path: the composed form materializes two
  * intermediate arrays per candidate pair; this is two hash-set builds
  * and one membership sweep, no array allocation. Set semantics
  * (duplicates collapse), so it is value-identical to the composed form
  * on distinct-element inputs — which shingle sets are — and the DuckDB
  * oracles verify it unchanged. Empty∪empty yields NaN like the composed
  * double division.
  */
case class JaccardSimilarity(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val setA = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < xs.numElements()) { setA.add(xs.getUTF8String(i)); i += 1 }
    val setB = new java.util.HashSet[UTF8String]()
    i = 0
    while (i < ys.numElements()) { setB.add(ys.getUTF8String(i)); i += 1 }
    var common = 0
    val it = setB.iterator()
    while (it.hasNext) if (setA.contains(it.next())) common += 1
    common.toDouble / (setA.size() + setB.size() - common).toDouble
  }

  // Janino (Spark's codegen compiler) has no generics — raw types + casts.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val setA = ctx.freshName("setA")
      val setB = ctx.freshName("setB")
      val i = ctx.freshName("i")
      val it = ctx.freshName("it")
      val common = ctx.freshName("common")
      s"""
         |java.util.HashSet $setA = new java.util.HashSet();
         |for (int $i = 0; $i < $x.numElements(); $i++) {
         |  $setA.add($x.getUTF8String($i));
         |}
         |java.util.HashSet $setB = new java.util.HashSet();
         |for (int $i = 0; $i < $y.numElements(); $i++) {
         |  $setB.add($y.getUTF8String($i));
         |}
         |int $common = 0;
         |java.util.Iterator $it = $setB.iterator();
         |while ($it.hasNext()) {
         |  if ($setA.contains($it.next())) $common++;
         |}
         |${ev.value} = (double) $common / (double) ($setA.size() + $setB.size() - $common);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSimilarity =
    copy(left = newLeft, right = newRight)
}
