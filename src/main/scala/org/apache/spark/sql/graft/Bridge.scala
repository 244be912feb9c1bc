package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression conversion for graft's native expressions.
  *
  * Lives under org.apache.spark.sql because the Spark 4 conversion API
  * (`classic.ExpressionUtils`) is `private[sql]` — the same bridge
  * pattern used by mainstream Spark extensions (Delta, Sedona, Iceberg)
  * to expose custom Catalyst expressions through the public Column API.
  * This is the ONLY file outside the graft.* namespace.
  */
object Bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register graft's SQL functions into an ALREADY-RUNNING session
    * (SparkSessionExtensions only applies at session construction). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
      name: String, info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
