package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal bridge into Spark's `private[sql]` Column<->Expression converters.
 * Spark 4 hides `Column(expr)` behind `org.apache.spark.sql.classic`; this
 * shim (a standard pattern for Spark extension libraries) re-exports just
 * the two converters the graft engine needs to expose custom Catalyst
 * expressions as user-facing `Column`s.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
