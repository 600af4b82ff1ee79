package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Package-side bridge: `ExpressionUtils` (Column <-> catalyst
  * Expression) is `private[sql]` in Spark 4, so libraries adding native
  * expressions need one object inside the `org.apache.spark.sql` package
  * to cross the boundary. Only the two conversion arrows are exposed.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
