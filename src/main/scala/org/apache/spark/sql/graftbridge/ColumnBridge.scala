package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the private[sql] Column⇄Expression converters — the sanctioned
  * extension-library pattern for registering custom Catalyst expressions
  * without a SparkSessionExtensions round-trip. Lives under
  * org.apache.spark.sql so the private[sql] scope is visible; keep this the
  * ONLY file outside the graft namespace. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
