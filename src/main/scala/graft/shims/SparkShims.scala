package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the public Column DSL and catalyst Expressions.
  * Spark 4 moved Column onto ColumnNode and made the conversion helpers
  * (`classic.ExpressionUtils`) private[sql]; this shim re-exposes exactly
  * the two conversions a custom-Expression library needs.
  */
object GraftShims {
  def toColumn(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
