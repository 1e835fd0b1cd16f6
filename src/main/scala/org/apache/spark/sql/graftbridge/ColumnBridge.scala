package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between public `Column` and catalyst `Expression` for the classic
  * (non-Connect) runtime. `ExpressionUtils` is `private[sql]`, so this shim
  * lives under the `org.apache.spark.sql` package to re-export the two
  * conversions the graft expression library needs. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
