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
}
