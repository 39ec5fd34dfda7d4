package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native fused word-n-gram hashing: for each window of `n` consecutive
  * words, the 60-bit md5 hash of the space-joined gram — equal to
  * `transform(sequence(1, size(ws)-n+1), i ->
  *   conv(substr(md5(concat_ws(' ', slice(ws, i, n))), 1, 15), 16, 10))`
  * in one pass with no intermediate gram-string array (the composed
  * higher-order-function form is CodegenFallback and allocates every
  * gram string before hashing). Null when the input has fewer than `n`
  * words (the composed form's sequence would count DOWN there — see the
  * size guard in callers).
  */
case class GramHashes60(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1 && n <= 64, s"gram width out of range: $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // null on < n words even when the input itself is non-nullable
  override def nullable: Boolean = true
  override def prettyName: String = "gram_hashes60"

  override protected def nullSafeEval(input: Any): Any =
    Gram60.hashGrams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = org.apache.spark.sql.graft.Gram60.hashGrams($x, $n);
         |if (${ev.value} == null) ${ev.isNull} = true;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GramHashes60 =
    copy(child = newChild)
}

/** Shared JVM implementation, called from both eval and generated code. */
object Gram60 {
  private val Space = UTF8String.fromString(" ")

  def hashGrams(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return null
    val out = new Array[Long](len - n + 1)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) {
        // a null word stays null: concatWs skips null inputs, exactly
        // like the composed concat_ws(' ', slice(ws, i, n)) form
        window(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      val gram = UTF8String.concatWs(Space, window: _*)
      out(i) = MinHashSigs.hash60(gram.getBytes)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
