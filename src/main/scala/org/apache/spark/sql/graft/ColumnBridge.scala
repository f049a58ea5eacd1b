package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst-Expression bridge for graft's custom expressions.
  *
  * Spark 4 made the Column-from-Expression constructor internal
  * (`org.apache.spark.sql.classic.ExpressionUtils` is private[sql]); this
  * shim lives inside the sql package to re-expose the two conversions —
  * the standard pattern for third-party Catalyst expression libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
