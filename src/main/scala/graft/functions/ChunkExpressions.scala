package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (CDC): split a document at positions where a
  * rolling window hash satisfies a mask, so chunk boundaries move WITH the
  * content — an insertion early in a document shifts every byte offset but
  * only perturbs the one chunk it lands in, and every other chunk keeps its
  * fingerprint. This is the LBFS/Rabin chunking idea (Muthitacharoen,
  * Chen &amp; Mazières, "A low-bandwidth network file system", SOSP 2001)
  * that fixed-width shingling lacks: shingles fingerprint every window,
  * CDC fingerprints a content-aligned partition of the text, giving a
  * sketch of size O(len/2^maskBits) instead of O(len).
  *
  * The hash is pinned to a SQL-replicable formulation so the operator and
  * the overlap join built on it are oracle-checked in DuckDB:
  *
  *  - window hash over the w CODE POINTS ending at character i (1-based):
  *    fold `h = (h * 257 + codepoint) mod (2^31 − 1)` from 0 — exactly
  *    `list_reduce(list_prepend(0, codes), (a,b) -> (a*257+b) % 2147483647)`;
  *  - cut after character i when `(h & mask) == 0`, mask = 2^maskBits − 1;
  *  - chunk fingerprint = first 60 bits of md5 over the chunk's UTF-8
  *    bytes — `('0x' || substr(md5(text[s : e]), 1, 15))::BIGINT`.
  *
  * The Spark evaluation is one linear pass (rolling update, thread-local
  * digest), not the oracle's quadratic O(len·w) direct form.
  *
  * Stateless-mask variant: no min/max chunk-length clamps, so boundaries
  * are a pure function of each window — replicable by a per-position
  * predicate in SQL. Clamped variants (min/max bounds force or suppress
  * cuts sequentially) change expected chunk-size tails but not the idea;
  * at mask 2^-m the chunk length is geometric with mean 2^m.
  */
object CdcHash {
  final val Mod  = 2147483647L // 2^31 − 1
  final val Base = 257L

  /** Content-defined chunk spans + fingerprints of `s` with window `w` and
    * boundary mask `(1<<maskBits)-1`. Returns array of struct
    * (start: int 1-based char position, len: int chars, hash: long) —
    * empty for the empty string, one whole-document chunk when no window
    * hash hits the mask (including len &lt; w).
    */
  def chunks(s: UTF8String, w: Int, maskBits: Int): GenericArrayData = {
    val bytes = s.getBytes
    val nChars = s.numChars()
    if (nChars == 0) return new GenericArrayData(Array.empty[Any])
    // char-start byte offsets (one extra entry = total length) and code
    // points, decoded in one pass over the UTF-8 bytes
    val offs = new Array[Int](nChars + 1)
    val cps = new Array[Int](nChars)
    var ci = 0; var bi = 0
    while (ci < nChars) {
      offs(ci) = bi
      val nb = UTF8String.numBytesForFirstByte(bytes(bi))
      cps(ci) = codePoint(bytes, bi, nb)
      bi += nb
      ci += 1
    }
    offs(nChars) = bytes.length

    val mask = (1L << maskBits) - 1L
    // B^w mod M, for rolling removal of the outgoing code point
    var bw = 1L
    var j = 0
    while (j < w) { bw = (bw * Base) % Mod; j += 1 }

    // cut positions (1-based char index the chunk ENDS at)
    val cuts = new Array[Int](nChars)
    var nCuts = 0
    var h = 0L
    var i = 0
    while (i < nChars) {
      h = (h * Base + cps(i)) % Mod
      if (i >= w) {
        h = (h - (cps(i - w) * bw) % Mod + Mod) % Mod
      }
      if (i >= w - 1 && (h & mask) == 0L) {
        cuts(nCuts) = i + 1
        nCuts += 1
      }
      i += 1
    }

    val lastIsEnd = nCuts > 0 && cuts(nCuts - 1) == nChars
    val nChunks = nCuts + (if (lastIsEnd) 0 else 1)
    val out = new Array[Any](nChunks)
    var start = 1 // 1-based char position
    var c = 0
    while (c < nChunks) {
      val end = if (c < nCuts) cuts(c) else nChars
      val hash = WinnowHash.md5Head60(
        bytes, offs(start - 1), offs(end) - offs(start - 1))
      out(c) = new GenericInternalRow(
        Array[Any](start, end - start + 1, hash))
      start = end + 1
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Code point of the UTF-8 sequence bytes[off, off+nb). */
  private def codePoint(bytes: Array[Byte], off: Int, nb: Int): Int = nb match {
    case 1 => bytes(off) & 0x7f
    case 2 => ((bytes(off) & 0x1f) << 6) | (bytes(off + 1) & 0x3f)
    case 3 => ((bytes(off) & 0x0f) << 12) | ((bytes(off + 1) & 0x3f) << 6) |
      (bytes(off + 2) & 0x3f)
    case _ => ((bytes(off) & 0x07) << 18) | ((bytes(off + 1) & 0x3f) << 12) |
      ((bytes(off + 2) & 0x3f) << 6) | (bytes(off + 3) & 0x3f)
  }
}

/** Expression form of [[CdcHash.chunks]]; the loop lives in the static
  * helper, called from both interpreted eval and generated code so the two
  * paths cannot drift.
  */
case class CdcChunks(child: Expression, w: Int, maskBits: Int)
    extends UnaryExpression {
  require(w >= 1, s"w=$w must be >= 1")
  require(maskBits >= 0 && maskBits <= 30,
    s"maskBits=$maskBits must be in [0, 30] (mask stays below the 2^31-1 modulus)")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("start", IntegerType, nullable = false),
      StructField("len", IntegerType, nullable = false),
      StructField("hash", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    CdcHash.chunks(input.asInstanceOf[UTF8String], w, maskBits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcHash.chunks($c, $w, $maskBits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ChunkFunctions {
  /** Column API: content-defined chunk spans + md5-60 fingerprints. */
  def cdcChunks(text: Column, w: Int = 16, maskBits: Int = 5): Column =
    column(CdcChunks(expression(text), w, maskBits))
}
