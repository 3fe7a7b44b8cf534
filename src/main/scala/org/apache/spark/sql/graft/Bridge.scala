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

  /** Surface the `private[sql]` optimizer-rule builders of a
    * SparkSessionExtensions, so specs can assert what an extension
    * registration actually installed.
    */
  def optimizerRules(ext: org.apache.spark.sql.SparkSessionExtensions,
                     spark: org.apache.spark.sql.SparkSession)
      : Seq[org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    ext.buildOptimizerRules(spark)
}
