package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE-ish token counter: the number of matches of
  * `[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]` — bit-equal to
  * `size(regexp_extract_all(text, pat, 0))` without running the regex
  * engine. The alternation's left-to-right greedy semantics reduce to
  * a closed form: maximal ASCII letter runs count one each, maximal
  * ASCII digit runs count one each, and every OTHER codepoint except
  * space counts one (spaces match no alternative and are skipped), so
  * one pass over the UTF-8 bytes — counting run starts and non-ASCII
  * lead bytes (continuation bytes skipped, so each multi-byte
  * codepoint counts exactly once) — is exact for any input.
  */
case class BpeTokenCount(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_token_count"

  override protected def nullSafeEval(input: Any): Any =
    BpeTokenCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x =>
      s"org.apache.spark.sql.graft.BpeTokenCount.count($x)")

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {
  /** One-pass run/codepoint counter — shared by eval and codegen. */
  def count(s: UTF8String): Int = {
    val nb = s.numBytes()
    var tokens = 0
    // 0 = none/other, 1 = letter run, 2 = digit run
    var prev = 0
    var i = 0
    while (i < nb) {
      val b = s.getByte(i)
      if ((b & 0xc0) == 0x80) {
        // UTF-8 continuation byte: part of the already-counted codepoint
      } else if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) {
        if (prev != 1) tokens += 1
        prev = 1
      } else if (b >= '0' && b <= '9') {
        if (prev != 2) tokens += 1
        prev = 2
      } else if (b == ' ') {
        prev = 0
      } else {
        // ASCII punctuation/control or a non-ASCII lead byte: one
        // match per codepoint
        tokens += 1
        prev = 0
      }
      i += 1
    }
    tokens
  }
}
