package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made these conversions
  * `private[sql]` (Column now wraps a ColumnNode); extension libraries
  * that define custom Catalyst expressions need exactly these two calls,
  * so we expose them from a package object inside `org.apache.spark.sql`
  * — the established pattern for Spark-native extension libraries. Only
  * [[graft.functions.NativeExprs]] uses this. */
object bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
