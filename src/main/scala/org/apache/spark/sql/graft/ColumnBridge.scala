package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ⇄ Expression converters so
  * graft's native Catalyst expressions can surface as `Column`s. This
  * is the one place the library steps inside Spark's package namespace
  * (the classic pattern for Spark-native extension libraries; no Spark
  * internals are modified).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a builder as a session temp function (`sessionState` is
    * `private[sql]` — same bridge rationale as above).
    */
  def registerTempFunction(spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
