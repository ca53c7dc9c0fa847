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

  /** TRY-semantics cast to long: malformed input yields NULL instead of
   * the ANSI runtime error, whatever the session's ansi setting. Used
   * where a NULL has a defined convention (capPerKey maps it to 0) and a
   * mid-job throw on one odd value would be worse than the convention. */
  def tryCastLong(c: Column): Column = column(
    org.apache.spark.sql.catalyst.expressions.Cast(
      expression(c), org.apache.spark.sql.types.LongType, None,
      org.apache.spark.sql.catalyst.expressions.EvalMode.TRY))

  /** True when `dt` is or nests a MapType — the one type `xxhash64`
   * rejects by default (map entry order is undefined, so a map hash is
   * not content-deterministic). Used to exclude such columns from
   * hash-everything defaults like capPerKey's tiebreak. */
  def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt.existsRecursively(_.isInstanceOf[org.apache.spark.sql.types.MapType])
}
