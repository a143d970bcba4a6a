package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4's
  * Column wraps a ColumnNode, not an Expression). Lives in the
  * org.apache.spark.sql package purely for access — the standard pattern
  * for Catalyst-level extensions. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
