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

  /** Rebind a DataFrame's (analyzed) plan to another session — lets a
    * pipeline run user SQL inside `spark.newSession()`'s ISOLATED
    * temp-view catalog, so view names can't clobber or leak into the
    * caller's session (`Dataset.ofRows` is `private[sql]` — same
    * bridge rationale as above). The analyzed plan is already
    * resolved, so re-analysis in the target session can't rebind names
    * against the wrong catalog.
    */
  def rebind(spark: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.queryExecution.analyzed)

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
