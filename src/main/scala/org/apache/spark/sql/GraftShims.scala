package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters — the
  * standard pattern for libraries registering native Catalyst expressions
  * (Spark 4 hides Column's Expression constructor behind ColumnNode).
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def sessionState(s: SparkSession): internal.SessionState =
    s.asInstanceOf[classic.SparkSession].sessionState
}
