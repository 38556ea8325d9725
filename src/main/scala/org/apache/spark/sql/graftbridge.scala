package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-package-private Column↔Expression converters
  * (Spark 4 moved the classic Column(expr) constructor behind
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * private[sql]). This is the supported conversion path for libraries
  * that define custom Catalyst expressions against the classic API. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
