package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim.{column, expression}
import org.apache.spark.sql.types._

/** Hashed-shingle extraction: n-gram shingles emitted directly as sorted
  * distinct 64-bit hashes, skipping shingle-string materialization entirely.
  *
  * Building "w1 w2 w3" strings per window (the naive HOF formulation) was
  * the dominant cost of MinHash dedup at sf0.1 — and the strings are thrown
  * away right after hashing. Here each window's hash chains xxh64 over the
  * member tokens' bytes in place: one pass, zero string allocation. Set
  * semantics (distinct) come from sort + dedupe of the longs, so downstream
  * `array_intersect`-based exact Jaccard is unchanged as long as hashes
  * don't collide (2^-64-scale risk, and deterministic either way).
  */
object ShingleUtil {
  /** Sort + dedupe in place; returns a GenericArrayData of the distinct longs. */
  def distinctSorted(buf: Array[Long], len: Int): GenericArrayData = {
    java.util.Arrays.sort(buf, 0, len)
    var out = 0
    var i = 0
    while (i < len) {
      if (out == 0 || buf(out - 1) != buf(i)) { buf(out) = buf(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, out))
  }
}

/** Word n-gram shingle hashes of an `array<string>` token column. */
case class ShingleHashes(child: Expression, n: Int, seed: Long)
    extends UnaryExpression with ArrayOfStringsInput {
  require(n > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val count = toks.numElements() - n + 1
    if (count <= 0) return new GenericArrayData(Array.emptyLongArray)
    val buf = new Array[Long](count)
    var out = 0
    var i = 0
    while (i < count) {
      var h = seed
      var j = i
      var valid = true
      while (valid && j < i + n) {
        if (toks.isNullAt(j)) valid = false
        else {
          val t = toks.getUTF8String(j)
          h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, h)
        }
        j += 1
      }
      if (valid) { buf(out) = h; out += 1 } // windows touching nulls are skipped
      i += 1
    }
    ShingleUtil.distinctSorted(buf, out)
  }

  /** Codegen twin of [[nullSafeEval]]: the window hash-chain runs inline in
    * the generated projection; sort + dedupe stays in the shared static
    * [[ShingleUtil]] so both paths are bit-identical.
    */
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, c => {
      val count = ctx.freshName("count"); val buf = ctx.freshName("buf")
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val h = ctx.freshName("h")
      val valid = ctx.freshName("valid"); val t = ctx.freshName("t")
      s"""
         |int $count = $c.numElements() - $n + 1;
         |if ($count <= 0) {
         |  ${ev.value} = new $gad(new long[0]);
         |} else {
         |  long[] $buf = new long[$count];
         |  int $out = 0;
         |  for (int $i = 0; $i < $count; $i++) {
         |    long $h = ${seed}L;
         |    boolean $valid = true;
         |    for (int $j = $i; $valid && $j < $i + $n; $j++) {
         |      if ($c.isNullAt($j)) {
         |        $valid = false;
         |      } else {
         |        org.apache.spark.unsafe.types.UTF8String $t = $c.getUTF8String($j);
         |        $h = $xxh.hashUnsafeBytes($t.getBaseObject(), $t.getBaseOffset(), $t.numBytes(), $h);
         |      }
         |    }
         |    if ($valid) { $buf[$out++] = $h; }
         |  }
         |  ${ev.value} = graft.functions.ShingleUtil.distinctSorted($buf, $out);
         |}
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Byte n-gram shingle hashes of a string column — each window is hashed
  * straight out of the UTF-8 buffer (zero-copy). Byte n-grams equal
  * character n-grams for ASCII text; for multi-byte text they remain a
  * valid (finer-grained) shingling, just not char-aligned.
  */
case class CharShingleHashes(child: Expression, n: Int, seed: Long)
    extends UnaryExpression {
  require(n > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val count = s.numBytes() - n + 1
    if (count <= 0) return new GenericArrayData(Array.emptyLongArray)
    val buf = new Array[Long](count)
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var i = 0
    while (i < count) {
      buf(i) = XXH64.hashUnsafeBytes(base, off + i, n, seed)
      i += 1
    }
    ShingleUtil.distinctSorted(buf, count)
  }

  /** Codegen twin of [[nullSafeEval]] — zero-copy window hashing straight
    * out of the UTF-8 buffer, inside whole-stage codegen.
    */
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, c => {
      val count = ctx.freshName("count"); val buf = ctx.freshName("buf")
      val base = ctx.freshName("base"); val off = ctx.freshName("off")
      val i = ctx.freshName("i")
      s"""
         |int $count = $c.numBytes() - $n + 1;
         |if ($count <= 0) {
         |  ${ev.value} = new $gad(new long[0]);
         |} else {
         |  long[] $buf = new long[$count];
         |  Object $base = $c.getBaseObject();
         |  long $off = $c.getBaseOffset();
         |  for (int $i = 0; $i < $count; $i++) {
         |    $buf[$i] = $xxh.hashUnsafeBytes($base, $off + $i, $n, ${seed}L);
         |  }
         |  ${ev.value} = graft.functions.ShingleUtil.distinctSorted($buf, $count);
         |}
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleFunctions {
  /** Sorted distinct hashes of word n-grams over a token-array column. */
  def wordShingleHashes(tokens: Column, n: Int, seed: Long = 42L): Column =
    column(ShingleHashes(expression(tokens), n, seed))

  /** Sorted distinct hashes of byte n-grams over a string column. */
  def charShingleHashes(text: Column, n: Int, seed: Long = 42L): Column =
    column(CharShingleHashes(expression(text), n, seed))
}
