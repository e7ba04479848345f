package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * standard pattern for Spark extension libraries that define custom
  * Catalyst expressions (Spark 4 made `Column` wrap a ColumnNode, so
  * `new Column(expr)` no longer exists). Kept to two one-liners. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a custom Expression under a SQL-callable name in an
    * EXISTING session (the SparkSessionExtensions path only applies at
    * session construction; this is the runtime-registration twin). */
  def registerExpression(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
