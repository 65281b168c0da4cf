package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Lives under `org.apache.spark.sql` only
  * to reach `classic.ExpressionUtils` (private[sql]); used where a
  * model-carrying native expression must be constructed DIRECTLY from
  * driver-side data instead of rendered through SQL text (the
  * giant-literal parser hazard — `Streams.gateContaminated`'s bloom can
  * serialize to 256 MiB under the raised runtime ceilings). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
