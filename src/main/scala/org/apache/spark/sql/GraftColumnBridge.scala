package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge. `classic.ExpressionUtils` is
  * private[sql] in Spark 4, so custom-expression libraries expose it via a
  * same-package accessor (the standard extension pattern; same mechanism
  * spark-connectors use). */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
