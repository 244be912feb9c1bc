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

  /** Fully release a frame's storage. `Dataset.unpersist` only clears
    * the CacheManager entry of a `persist()`ed plan; for a
    * `localCheckpoint()`ed frame the blocks were pinned by RDD-level
    * persist, which the CacheManager never sees — measured:
    * `getPersistentRDDs` keeps the entry after `Dataset.unpersist`,
    * and the blocks then live until driver GC + ContextCleaner get
    * around to them. Every checkpoint-release in graft (iterative
    * trainers, corpus dedup state, pipeline seams) goes through here
    * so the RDD blocks die deterministically with the frame. */
  def releaseFrame(df: org.apache.spark.sql.Dataset[_],
      blocking: Boolean = false): Unit = {
    df.unpersist(blocking)
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking)
      case _ => ()
    }
  }

  /** Register graft's SQL functions into an ALREADY-RUNNING session
    * (SparkSessionExtensions only applies at session construction). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
      name: String, info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
