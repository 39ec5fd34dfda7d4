package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native punctuation counter: the number of codepoints NOT in
  * `[A-Za-z0-9 ]` — bit-equal to
  * `size(regexp_extract_all(text, '[^A-Za-z0-9 ]', 0))` (and DuckDB's
  * `len(regexp_extract_all(text, '[^A-Za-z0-9 ]'))`) without running a
  * regex engine per character.
  *
  * Why native: the regex form was text_quality's REAL hot path (the
  * sf1 profile attributed ~2.4 s of the 4.9 s wall to one
  * regexp_extract_all pass, and projection collapse inlines the
  * expression into each of its downstream uses, paying it more than
  * once). Here: one pass over the UTF8 bytes counting ASCII
  * alphanumeric/space bytes — exact for any UTF-8 input, because
  * ASCII bytes only ever appear as standalone codepoints — plus the
  * codepoint count; the difference is the answer. O(bytes), no
  * allocation, whole-stage codegen.
  */
case class PunctCount(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "punct_count"

  override protected def nullSafeEval(input: Any): Any =
    PunctCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x =>
      s"org.apache.spark.sql.graft.PunctCount.count($x)")

  override protected def withNewChildInternal(newChild: Expression): PunctCount =
    copy(child = newChild)
}

object PunctCount {
  /** Codepoints outside [A-Za-z0-9 ]. Shared by eval and codegen. */
  def count(s: UTF8String): Int = {
    val nb = s.numBytes()
    var ascii = 0
    var i = 0
    while (i < nb) {
      val b = s.getByte(i)
      if ((b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z') ||
        (b >= 'a' && b <= 'z') || b == ' ') ascii += 1
      i += 1
    }
    s.numChars() - ascii
  }
}
