package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native banded Levenshtein: `leven_band(a, b, k)` = edit distance when
  * it is ≤ k, else -1 — the same contract as Spark's
  * `levenshtein(a, b, threshold)` and bit-equal to it (LevenBandSpec
  * proves equality on fixture text, random edits, unicode, and the
  * threshold boundary).
  *
  * Why not the built-in: `UTF8String.levenshteinDistance` allocates its
  * working arrays per call and re-decodes codepoints as it goes —
  * ~220 µs for a 300-char pair at threshold 30. The verify phase of
  * fuzzy dedup runs MILLIONS of such calls (dedup_fuzzy_levenshtein:
  * ~0.5M pairs at sf0.1 — the leading cost of the whole operator), so
  * per-call allocation is the hot path. This expression keeps the two
  * DP rows in a thread-local buffer, walks raw bytes when both inputs
  * are pure ASCII (the overwhelmingly common case for English corpora;
  * full codepoint decode otherwise), and early-exits a row whose
  * minimum exceeds k.
  */
case class LevenBand(left: Expression, right: Expression, threshold: Int)
  extends BinaryExpression with ExpectsInputTypes {

  require(threshold >= 0, "leven_band threshold must be >= 0")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "leven_band"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LevenBand.dist(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.LevenBand.dist($a, $b, $threshold);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): LevenBand =
    copy(left = newLeft, right = newRight)
}

object LevenBand {

  // two DP rows + the decoded codepoint arrays, reused across calls on
  // the same task thread — zero steady-state allocation
  private val prevBuf = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](256)
  }
  private val curBuf = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](256)
  }
  private val cpBuf = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](512)
  }

  /** Edit distance if ≤ k else -1. */
  def dist(a: UTF8String, b: UTF8String, k: Int): Int = {
    val ab = a.getBytes
    val bb = b.getBytes
    if (isAscii(ab) && isAscii(bb)) distAscii(ab, bb, k)
    else distCp(a, b, k)
  }

  private def isAscii(bs: Array[Byte]): Boolean = {
    var i = 0
    while (i < bs.length) {
      if ((bs(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  private def distAscii(a: Array[Byte], b: Array[Byte], k: Int): Int = {
    // operate on the shorter string as the inner dimension so the band
    // walk allocates by min(len); symmetric metric
    if (a.length < b.length) return distAscii(b, a, k)
    val n = a.length
    val m = b.length
    if (n - m > k) return -1
    if (m == 0) return if (n <= k) n else -1
    val inf = k + 1
    val buf = rows(m + 1)
    var prev = buf._1
    var cur = buf._2
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = if (i - k > 1) i - k else 1
      val hi = if (i + k < m) i + k else m
      cur(lo - 1) = if (lo == 1) (if (i <= k) i else inf) else inf
      var rowMin = cur(lo - 1)
      val ca = a(i - 1)
      j = lo
      while (j <= hi) {
        val sub = prev(j - 1) + (if (ca == b(j - 1)) 0 else 1)
        val del = (if (j < i + k) prev(j) else inf) + 1
        val ins = cur(j - 1) + 1
        var v = if (sub < del) sub else del
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (hi < m) cur(hi + 1) = inf
      if (rowMin > k) return -1
      val t = prev; prev = cur; cur = t
      i += 1
    }
    if (prev(m) <= k) prev(m) else -1
  }

  /** Codepoint path for non-ASCII input — decodes once into reused
    * buffers, then the same banded DP.
    */
  private def distCp(a: UTF8String, b: UTF8String, k: Int): Int = {
    val sa = a.toString
    val sb = b.toString
    val na = sa.codePointCount(0, sa.length)
    val nb = sb.codePointCount(0, sb.length)
    val cps = cp(na + nb)
    var i = 0; var o = 0
    while (o < sa.length) { val c = sa.codePointAt(o); cps(i) = c; i += 1; o += Character.charCount(c) }
    val offB = i
    o = 0
    while (o < sb.length) { val c = sb.codePointAt(o); cps(i) = c; i += 1; o += Character.charCount(c) }
    distCpArr(cps, 0, na, cps, offB, nb, k)
  }

  private def distCpArr(a: Array[Int], oa: Int, n0: Int, b: Array[Int], ob: Int, m0: Int, k: Int): Int = {
    if (n0 < m0) return distCpArr(b, ob, m0, a, oa, n0, k)
    val n = n0
    val m = m0
    if (n - m > k) return -1
    if (m == 0) return if (n <= k) n else -1
    val inf = k + 1
    val buf = rows(m + 1)
    var prev = buf._1
    var cur = buf._2
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = if (i - k > 1) i - k else 1
      val hi = if (i + k < m) i + k else m
      cur(lo - 1) = if (lo == 1) (if (i <= k) i else inf) else inf
      var rowMin = cur(lo - 1)
      val ca = a(oa + i - 1)
      j = lo
      while (j <= hi) {
        val sub = prev(j - 1) + (if (ca == b(ob + j - 1)) 0 else 1)
        val del = (if (j < i + k) prev(j) else inf) + 1
        val ins = cur(j - 1) + 1
        var v = if (sub < del) sub else del
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (hi < m) cur(hi + 1) = inf
      if (rowMin > k) return -1
      val t = prev; prev = cur; cur = t
      i += 1
    }
    if (prev(m) <= k) prev(m) else -1
  }

  /** The two grown-on-demand thread-local DP rows. */
  private def rows(w: Int): (Array[Int], Array[Int]) = {
    var p = prevBuf.get()
    if (p.length < w) { p = new Array[Int](w); prevBuf.set(p) }
    var c = curBuf.get()
    if (c.length < w) { c = new Array[Int](w); curBuf.set(c) }
    (p, c)
  }

  private def cp(w: Int): Array[Int] = {
    var buf = cpBuf.get()
    if (buf.length < w) {
      buf = new Array[Int](w)
      cpBuf.set(buf)
    }
    buf
  }
}
