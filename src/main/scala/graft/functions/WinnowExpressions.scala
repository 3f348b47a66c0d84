package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass winnowing (Schleimer, Wilkerson &amp; Aiken, SIGMOD 2003) over
  * md5-derived character k-gram hashes.
  *
  * Value semantics are pinned to the SQL-replicable formulation the DuckDB
  * oracle runs — each k-gram's hash equals
  * `('0x' || substr(md5(gram), 1, 15))::BIGINT` (the first 60 bits of the
  * digest) — but the evaluation is linear instead of the SQL pipeline's
  * quadratic shape: the byte buffer is materialized once (no per-window
  * O(i) substring seek), one thread-local digest is reset per window (no
  * per-call allocation), there is no hex round-trip, and the per-window
  * minima come from a monotonic-deque sliding minimum in O(nGrams) total.
  */
object WinnowHash {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5 over bytes [off, off+len). */
  def md5Head60(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = md5.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    val head =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    head >>> 4 // 16 hex chars -> first 15
  }

  /** Sorted distinct per-window (width w) minima of the CHARACTER k-gram
    * hashes of `s`; empty when fewer than w k-grams exist. Grams are
    * char-aligned (each window hashes the UTF-8 bytes spanning k
    * characters), matching `md5(substring(text, i, k))` and the DuckDB
    * oracle's `md5(text[i : i+k-1])` on any input, not just ASCII — a
    * byte-aligned window would split multibyte characters and diverge.
    */
  def fingerprints(s: UTF8String, k: Int, w: Int): GenericArrayData = {
    val bytes = s.getBytes
    // char-start byte offsets (one extra entry = total length)
    val nChars = s.numChars()
    val offs = new Array[Int](nChars + 1)
    var ci = 0; var bi = 0
    while (ci < nChars) {
      offs(ci) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    offs(nChars) = bytes.length
    val nGrams = nChars - k + 1
    if (nGrams < w) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      hs(i) = md5Head60(bytes, offs(i), offs(i + k) - offs(i))
      i += 1
    }
    // monotonic deque of candidate-minimum indices, front = current min
    val deque = new Array[Int](nGrams)
    var head = 0; var tail = 0 // [head, tail)
    val out = new Array[Long](nGrams - w + 1)
    var o = 0
    i = 0
    while (i < nGrams) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) { out(o) = hs(deque(head)); o += 1 }
      i += 1
    }
    ShingleUtil.distinctSorted(out, o)
  }

  /** True iff some fingerprint VALUE is selected at ≥ 2 DISTINCT gram
    * positions — the within-doc half of the winnow guarantee: two
    * occurrences of the same substring of length ≥ w + k − 1 inside ONE
    * document each select a common fingerprint value at their own
    * positions, so the selection sequence repeats that value. (The
    * distinct-sorted [[fingerprints]] output collapses exactly this
    * signal, which is why the prefilter needs its own pass.) Selected
    * indices are non-decreasing over the sliding window, so "new
    * selection" is simply an index change; false positives — a re-selected
    * k-gram that is not part of a long repeat — only weaken pruning,
    * never correctness.
    */
  def hasInternalRepeat(s: UTF8String, k: Int, w: Int): Boolean = {
    val bytes = s.getBytes
    val nChars = s.numChars()
    if (nChars < k) return false
    val offs = new Array[Int](nChars + 1)
    var ci = 0; var bi = 0
    while (ci < nChars) {
      offs(ci) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    offs(nChars) = bytes.length
    val nGrams = nChars - k + 1
    if (nGrams < w) return false
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      hs(i) = md5Head60(bytes, offs(i), offs(i + k) - offs(i))
      i += 1
    }
    val deque = new Array[Int](nGrams)
    var head = 0; var tail = 0
    val seen = new java.util.HashSet[java.lang.Long]()
    var lastIdx = -1
    i = 0
    while (i < nGrams) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1 && deque(head) != lastIdx) {
        lastIdx = deque(head)
        if (!seen.add(hs(lastIdx))) return true
      }
      i += 1
    }
    false
  }
}

/** Expression form of [[WinnowHash.fingerprints]]; the loop lives in the
  * static helper, called from both interpreted eval and generated code so
  * the paths cannot drift.
  */
case class WinnowedMd5Fingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"k=$k and w=$w must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowHash.fingerprints(input.asInstanceOf[UTF8String], k, w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowHash.fingerprints($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Boolean form of [[WinnowHash.hasInternalRepeat]]. */
case class WinnowInternalRepeat(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"k=$k and w=$w must be >= 1")
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowHash.hasInternalRepeat(input.asInstanceOf[UTF8String], k, w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowHash.hasInternalRepeat($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFunctions {
  /** Column API: winnowed md5 fingerprints of a string column. */
  def winnowedMd5Fingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    column(WinnowedMd5Fingerprints(expression(text), k, w))

  /** Column API: within-doc repeated-fingerprint flag (see
    * [[WinnowHash.hasInternalRepeat]]).
    */
  def winnowInternalRepeat(text: Column, k: Int = 8, w: Int = 4): Column =
    column(WinnowInternalRepeat(expression(text), k, w))
}
