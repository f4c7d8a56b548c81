package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridges Catalyst `Expression`s to the public `Column` API.
 * `org.apache.spark.sql.classic.ExpressionUtils` is `private[sql]`, so
 * this one-file shim lives under the `org.apache.spark.sql` package —
 * the standard pattern for Spark extension libraries.
 */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
