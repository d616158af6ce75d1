package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ⇄ Column bridge. Spark 4 made these converters
  * `private[sql]`; graft's native expressions ([[graft.functions
  * .NativeExpressions]]) need exactly the two calls below, so this
  * lives inside the org.apache.spark.sql namespace on purpose. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
