package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access shim for `private[sql]` Spark internals needed to lift a custom
  * Catalyst `Expression` into the public `Column` API (Spark 4 routes
  * Column through ColumnNode; ExpressionUtils is the sanctioned bridge
  * but is sql-package-private). Standard practice for Spark extension
  * libraries; nothing here touches non-public behavior beyond the bridge.
  */
object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
