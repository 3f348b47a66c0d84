package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim.{column, expression}
import org.apache.spark.sql.types._

/** Shared input validation for token/shingle-array expressions. */
trait ArrayOfStringsInput { self: UnaryExpression =>
  protected def allowLongElements: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) if allowLongElements => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>" +
        (if (allowLongElements) " or array<bigint>" else "") +
        s" input, got ${other.simpleString}")
  }
}

/** Sketch hash functions for near-duplicate detection, as native Catalyst
  * expressions over token/shingle arrays.
  *
  * Hashing strategy: one xxHash64 pass over each element's UTF-8 bytes
  * (Spark's own `XXH64`), then k cheap splitmix64 finalizer remixes derive
  * the k MinHash permutations — O(bytes + k) per element instead of
  * O(k · bytes). Deterministic across JVMs/partitionings by construction.
  *
  * North-star extension (dedup); no counterpart in the reference.
  */
object SketchHash {
  final val GOLDEN: Long = -7046029254386353131L // 2^64 / golden ratio

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + GOLDEN
    z = (z ^ (z >>> 30)) * -4658895280553007687L
    z = (z ^ (z >>> 27)) * -7723592293110705685L
    z ^ (z >>> 31)
  }

  @inline def hashUtf8(s: org.apache.spark.unsafe.types.UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  /** Accumulate one token hash into a 64-slot SimHash vote vector.
    * Shared by the per-row expression and the group Aggregator so the two
    * stay bit-identical by construction.
    */
  @inline def voteBits(h: Long, votes: Array[Int]): Unit = {
    var b = 0
    while (b < 64) {
      if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
      b += 1
    }
  }

  /** Collapse a vote vector to the final 64-bit SimHash signature. */
  def votesToSig(votes: Array[Int]): Long = {
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** MinHash signature of an `array<string>` shingle set: for permutation i,
  * `min over shingles of mix(xxh64(shingle) + i·GOLDEN)`. Empty input yields
  * a saturated (Long.MaxValue) signature — callers filter empty sets.
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression with ArrayOfStringsInput {
  require(numHashes > 0)
  override protected def allowLongElements: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Accepts `array<string>` (hashes the bytes) or `array<long>`
    * (pre-hashed shingles from [[ShingleHashes]] — just remixed).
    */
  private lazy val elemIsLong =
    child.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val base =
          if (elemIsLong) SketchHash.mix(arr.getLong(j) ^ seed)
          else SketchHash.hashUtf8(arr.getUTF8String(j), seed)
        var i = 0
        var acc = base
        while (i < numHashes) {
          val h = SketchHash.mix(acc)
          if (h < sig(i)) sig(i) = h
          acc += SketchHash.GOLDEN
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** Same loop as [[nullSafeEval]], emitted into whole-stage codegen so the
    * signature stage fuses with the surrounding projection (the mix steps
    * call the static [[SketchHash]] helpers, keeping the two paths
    * bit-identical by construction — asserted in SketchSpec).
    */
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sh = "graft.functions.SketchHash"
    val xxh = classOf[XXH64].getName
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, c => {
      val sig = ctx.freshName("sig"); val n = ctx.freshName("n")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      val baseInit =
        if (elemIsLong) s"long $acc = $sh.mix($c.getLong($j) ^ ${seed}L);"
        else
          s"""org.apache.spark.unsafe.types.UTF8String $s = $c.getUTF8String($j);
             |long $acc = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), ${seed}L);""".stripMargin
      s"""
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |int $n = $c.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$c.isNullAt($j)) {
         |    $baseInit
         |    for (int $i = 0; $i < $numHashes; $i++) {
         |      long $h = $sh.mix($acc);
         |      if ($h < $sig[$i]) $sig[$i] = $h;
         |      $acc += ${SketchHash.GOLDEN}L;
         |    }
         |  }
         |}
         |${ev.value} = new $gad($sig);
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of an `array<string>` token multiset: per-bit vote of each
  * token's xxh64; bit b of the result is 1 iff the vote sum is positive.
  */
case class SimHash64(child: Expression, seed: Long)
    extends UnaryExpression with ArrayOfStringsInput {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        SketchHash.voteBits(SketchHash.hashUtf8(arr.getUTF8String(j), seed), votes)
      }
      j += 1
    }
    SketchHash.votesToSig(votes)
  }

  /** Codegen twin of [[nullSafeEval]] — the vote loop stays in the shared
    * static helpers so interpreted and generated paths cannot drift.
    */
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sh = "graft.functions.SketchHash"
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes"); val n = ctx.freshName("n")
      val j = ctx.freshName("j"); val s = ctx.freshName("s")
      s"""
         |int[] $votes = new int[64];
         |int $n = $c.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$c.isNullAt($j)) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $c.getUTF8String($j);
         |    $sh.voteBits($xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), ${seed}L), $votes);
         |  }
         |}
         |${ev.value} = $sh.votesToSig($votes);
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash votes over PRE-HASHED 64-bit token values (`array<bigint>`):
  * bit b of the result is 1 iff more element hashes have bit b set than
  * not. Lets any SQL-computable hash family (e.g. md5-derived longs, which
  * a DuckDB oracle can replicate) reuse the native vote loop instead of a
  * per-bit higher-order-function rescan.
  */
case class SimHashFromHashes(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) SketchHash.voteBits(arr.getLong(j), votes)
      j += 1
    }
    SketchHash.votesToSig(votes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sh = "graft.functions.SketchHash"
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes"); val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      s"""
         |int[] $votes = new int[64];
         |int $n = $c.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$c.isNullAt($j)) { $sh.voteBits($c.getLong($j), $votes); }
         |}
         |${ev.value} = $sh.votesToSig($votes);
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashFunctions {
  /** Column API: k-permutation MinHash signature of a shingle-set column. */
  def minhashSignature(shingles: Column, numHashes: Int = 64, seed: Long = 42L): Column =
    column(MinHashSignature(expression(shingles), numHashes, seed))

  /** Column API: 64-bit SimHash of a token-array column. */
  def simhash64(tokens: Column, seed: Long = 42L): Column =
    column(SimHash64(expression(tokens), seed))

  /** Column API: SimHash votes over pre-hashed 64-bit token values. */
  def simhashFromHashes(hashes: Column): Column =
    column(SimHashFromHashes(expression(hashes)))
}
