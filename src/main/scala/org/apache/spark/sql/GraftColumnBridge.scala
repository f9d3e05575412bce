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

  /** DataFrame over an InternalRow RDD (`internalCreateDataFrame` is
    * private[sql]) — used by the executor-pinned sketch gate, whose
    * zip-co-located probe produces InternalRows directly so the frontier
    * never leaves Tungsten row format. */
  def internalDf(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}
