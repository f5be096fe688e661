package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column <-> Expression conversions —
  * Spark 4 hides `Column.expr` behind the connect-agnostic ColumnNode API,
  * and a library registering native Catalyst expressions needs exactly this
  * pair (the same mechanism spark-internal `functions` uses).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
