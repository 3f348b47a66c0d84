package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.ColumnShim.{column, expression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built Bloom filter, as a native codegen'd
  * expression over a 64-bit key hash (pair with `xxhash64(keys...)`).
  *
  * No false negatives: `false` means DEFINITELY absent, so rows failing the
  * probe can skip an exact anti-join entirely; `true` rows still need the
  * exact check. The filter rides into tasks via Java serialization of the
  * expression (compact bit array — size it with `expectedNumItems`/`fpp`).
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName probes a 64-bit key hash: need bigint input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomFunctions {
  /** Column API: probe a pre-built Bloom filter with a bigint key hash. */
  def mightContain(keyHash: Column, bloom: BloomFilter): Column =
    column(BloomMightContain(expression(keyHash), bloom))
}
