package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * standard pattern for libraries shipping custom Catalyst expressions
  * (same approach as spark-packages ecosystems; Spark 4 moved the classic
  * converters behind `org.apache.spark.sql.classic.ExpressionUtils`). */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
