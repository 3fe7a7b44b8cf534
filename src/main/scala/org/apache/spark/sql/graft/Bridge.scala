package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge for Spark 4's `private[sql]` Column↔Expression
  * conversions, so custom Catalyst expressions in the graft packages can
  * surface as user-facing Columns. (In Spark 4 `Column` wraps a
  * ColumnNode; the classic converter lives behind the sql package.)
  */
object Bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
