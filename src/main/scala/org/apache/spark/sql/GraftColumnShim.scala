package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between custom Catalyst `Expression`s and the public `Column`
  * API. `classic.ExpressionUtils` is `private[sql]`, so the bridge lives in
  * the `org.apache.spark.sql` package — the established pattern for
  * libraries shipping native expressions.
  */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
