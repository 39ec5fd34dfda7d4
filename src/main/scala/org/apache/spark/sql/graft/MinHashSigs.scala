package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Native fused MinHash signature over an array of string shingles.
  *
  * For each shingle: 60-bit hash = first 15 hex digits of md5 (identical
  * to `conv(substr(md5(sh),1,15),16,10)` — the top 8 md5 bytes as an
  * unsigned big-endian long, shifted right 4). For each permutation
  * p ∈ [0, numPerm): universal-hash remix
  * `((h % P) * ((40503·(p+1)) % P) + p) % P` with P = 1073741789
  * (< 2^30, so the product stays < 2^60 — no overflow in any engine).
  * Result = the per-permutation minima, exactly the composed
  * `transform(sequence(0,n-1), p -> array_min(transform(...)))`
  * pipeline (and its DuckDB oracle mirror) in ONE primitive loop.
  *
  * Why native: Spark's higher-order functions are CodegenFallback —
  * the composed form runs numPerm × n_shingles boxed lambda steps per
  * row and materializes the intermediate hash array; this runs fused
  * inside whole-stage codegen with no intermediate allocation.
  * (ref for the MinHash-band pipeline being accelerated:
  * the reference's dedup has no native analog — this is the Spark-first
  * re-expression's hot path, cf. DedupSuite "dedup_minhash_lsh".)
  */
case class MinHashSigs(child: Expression, numPerm: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(numPerm > 0 && numPerm <= 1024, s"numPerm out of range: $numPerm")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // null on an empty (or all-null-element) shingle set even when the
  // input is non-nullable
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs"

  override protected def nullSafeEval(input: Any): Any = {
    val shingles = input.asInstanceOf[ArrayData]
    val n = shingles.numElements()
    val mins = Array.fill[Long](numPerm)(Long.MaxValue)
    val P = MinHashSigs.P
    var seen = false
    var i = 0
    while (i < n) {
      // null shingles are skipped, matching the composed form where
      // md5(NULL) is null and array_min ignores nulls
      if (!shingles.isNullAt(i)) {
        val h = MinHashSigs.hash60(shingles.getUTF8String(i).getBytes)
        val hm = h % P
        var p = 0
        while (p < numPerm) {
          val v = (hm * ((40503L * (p + 1)) % P) + p) % P
          if (v < mins(p)) mins(p) = v
          p += 1
        }
        seen = true
      }
      i += 1
    }
    if (!seen) return null
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val h = ctx.freshName("h")
      val hm = ctx.freshName("hm")
      val v = ctx.freshName("v")
      val seen = ctx.freshName("seen")
      val P = MinHashSigs.P
      s"""
         |int $n = $x.numElements();
         |long[] $mins = new long[$numPerm];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $seen = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i)) {
         |    long $h = org.apache.spark.sql.graft.MinHashSigs.hash60(
         |      $x.getUTF8String($i).getBytes());
         |    long $hm = $h % ${P}L;
         |    for (int $p = 0; $p < $numPerm; $p++) {
         |      long $v = ($hm * ((40503L * ($p + 1)) % ${P}L) + $p) % ${P}L;
         |      if ($v < $mins[$p]) $mins[$p] = $v;
         |    }
         |    $seen = true;
         |  }
         |}
         |if ($seen) {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($mins);
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  /** Universal-hash modulus shared with the composed form and the
    * DuckDB oracle — keep the three in sync.
    */
  final val P = 1073741789L

  /** First 15 hex digits of md5 as a long — bit-identical to Spark's
    * `conv(substr(md5(s),1,15),16,10)` and DuckDB's
    * `('0x'||substr(md5(s),1,15))::BIGINT`. Called from generated code.
    */
  def hash60(bytes: Array[Byte]): Long = {
    val md5 = org.apache.commons.codec.digest.DigestUtils.md5(bytes)
    var h = 0L
    var k = 0
    while (k < 8) { h = (h << 8) | (md5(k) & 0xffL); k += 1 }
    h >>> 4
  }
}
