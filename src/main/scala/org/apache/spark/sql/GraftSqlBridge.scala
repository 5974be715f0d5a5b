package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to `private[sql]` Column↔Expression plumbing (Spark 4.x
  * moved the classic converters behind `org.apache.spark.sql.classic`).
  * This is the only graft file living inside the Spark namespace.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
