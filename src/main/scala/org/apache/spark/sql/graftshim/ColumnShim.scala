package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the sql-private Column ↔ Expression converters (Spark 4 moved
  * them behind `private[sql]`). Lives in a subpackage of
  * `org.apache.spark.sql` solely to satisfy that access qualifier; the only
  * consumer is graft.functions.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
