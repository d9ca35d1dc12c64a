package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge for custom Catalyst expressions.
  *
  * Spark 4's Column wraps a ColumnNode and the conversion helpers
  * (classic.ExpressionUtils) are private[sql]; a bridge object inside
  * the sql package is the standard extension-library pattern for
  * exposing custom expressions as Columns.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
