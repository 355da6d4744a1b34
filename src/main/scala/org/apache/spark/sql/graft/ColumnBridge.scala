package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between raw Catalyst [[Expression]]s and the public [[Column]] API.
  *
  * Spark 4 made `Column` wrap a `ColumnNode` rather than an `Expression`;
  * the conversion helpers live behind `private[sql]`. Extensions that ship
  * custom expressions conventionally host a small shim inside the
  * `org.apache.spark.sql` package tree to reach them — this is that shim,
  * kept to two forwarding calls. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
