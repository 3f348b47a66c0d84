package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftshim.ColumnShim.{column, expression}
import org.apache.spark.sql.types._

/** Shared interleave kernel so the interpreted and generated paths stay
  * bit-identical by construction.
  */
object ZOrderUtil {
  /** Morton interleave of the low `bits` bits of `a` (even positions) and
    * `b` (odd positions).
    */
  def interleave(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >>> i) & 1L) << (2 * i)
      z |= ((b >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}

/** Morton (Z-order) key of two long columns: bit i of `left` lands at
  * result bit 2i, bit i of `right` at 2i+1, over the low `bits` bits of
  * each (higher bits are deliberately ignored — callers range-reduce or
  * bucket first; keys must be non-negative for the curve to be monotone).
  *
  * Purpose is STORAGE LAYOUT, not a query result: sorting or
  * range-partitioning a table by its Z-key clusters rows so that per-file
  * min/max statistics are tight in BOTH dimensions at once, which is what
  * makes scan-time file/row-group skipping work for predicates on either
  * column — the multi-dimensional generalization of sorting by a single
  * key (same layout trick popularized by Delta's OPTIMIZE ZORDER BY, here
  * as a plain codegen'd expression feeding `repartitionByRange`).
  */
case class ZOrderKey(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 32, s"bits=$bits must be in [1, 32]")
  override def prettyName: String = "zorder_key"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint) inputs, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderUtil.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  /** Same loop as [[ZOrderUtil.interleave]], emitted into whole-stage
    * codegen — no virtual calls in the per-row path.
    */
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($a >>> $i) & 1L) << (2 * $i);
         |  $z |= (($b >>> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Reference kernel for the Hilbert curve index so the interpreted and
  * generated paths stay bit-identical by construction.
  */
object HilbertUtil {
  /** Hilbert distance of `(x, y)` on the `2^bits × 2^bits` grid (classic
    * iterative xy2d: per level, quadrant contribution `s·s·((3·rx)^ry)`
    * plus the reflect-and-swap rotation). Inputs are masked to the low
    * `bits` bits so out-of-range coordinates degrade deterministically
    * instead of reflecting negative.
    */
  def xy2d(xIn: Long, yIn: Long, bits: Int): Long = {
    val n = 1L << bits
    var x = xIn & (n - 1)
    var y = yIn & (n - 1)
    var d = 0L
    var s = n >>> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>>= 1
    }
    d
  }
}

/** Hilbert-curve index of two long columns over the low `bits` bits of
  * each — the layout sibling of [[ZOrderKey]] with strictly better
  * locality: consecutive Hilbert indices are always Manhattan-adjacent
  * cells (property-tested), whereas the Z curve takes long diagonal jumps
  * at power-of-two boundaries. Tighter per-file min/max envelopes on both
  * dimensions mean more files skipped for the same predicate, which is
  * why Iceberg/Delta-style table optimizers offer Hilbert ordering above
  * Z-order. Same usage: feed `repartitionByRange` / sortWithinPartitions,
  * never a query result. Dimensions must be range-normalized to
  * comparable bit widths first (see [[LayoutFunctions.zorderKey]]).
  */
case class HilbertKey(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits=$bits must be in [1, 31]")
  override def prettyName: String = "hilbert_key"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint) inputs, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertUtil.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  /** Same loop as [[HilbertUtil.xy2d]], emitted into whole-stage codegen. */
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = 1L << bits
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a & ${n - 1}L;
         |long $y = $b & ${n - 1}L;
         |long $d = 0L;
         |for (long $s = ${n >>> 1}L; $s > 0; $s >>>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3 * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = ${n - 1}L - $x; $y = ${n - 1}L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LayoutFunctions {
  /** Z-order key column over two integral columns (cast to long).
    *
    * Interleaving weights bit POSITIONS equally, so dimensions must be
    * range-normalized to comparable bit widths first (scale the narrow one
    * up or bucket the wide one down) — a 4-bit column interleaved with an
    * 8-bit column degenerates to a sort on the wide column's high bits.
    * (Production z-order layouts normalize via per-column range-partition
    * rank for exactly this reason.)
    */
  def zorderKey(a: Column, b: Column, bits: Int = 16): Column =
    column(ZOrderKey(expression(a.cast("long")), expression(b.cast("long")), bits))

  /** Hilbert curve index over two integral columns (cast to long); same
    * range-normalization caveat as [[zorderKey]].
    */
  def hilbertKey(a: Column, b: Column, bits: Int = 16): Column =
    column(HilbertKey(expression(a.cast("long")), expression(b.cast("long")), bits))
}
