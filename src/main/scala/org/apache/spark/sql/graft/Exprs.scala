package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge between the public `Column` API and Catalyst `Expression`s.
 * Spark 4 routes `Column` through `ColumnNode`s; the classic-session
 * converters are `private[sql]`, hence this shim lives inside the
 * `org.apache.spark.sql` namespace (the reference extension took the same
 * approach for its Catalyst-level code).
 */
object Exprs {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
