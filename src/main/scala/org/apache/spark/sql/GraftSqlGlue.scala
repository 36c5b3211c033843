package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge for graft's native Catalyst expressions.
  *
  * `classic.ExpressionUtils` is `private[sql]` in Spark 4, so a library
  * that builds `Column`s from its own `Expression`s needs this one-file
  * shim in the `org.apache.spark.sql` package — the standard pattern
  * used by Spark-extension libraries. Nothing else lives here.
  */
object GraftSqlGlue {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
