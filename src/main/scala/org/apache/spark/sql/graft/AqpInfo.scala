package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/**
 * Analysis-type introspection for rewritten queries — the user-facing
 * equivalent of the reference's `AssertAQPAnalysis` test utility
 * (`/root/reference/src/test/scala/.../AssertAQPAnalysis`-style checks used
 * across its suites): report which estimator family a `WITH ERROR` query
 * actually planned with, without digging through `explain` output.
 */
object AqpInfo {

  /** One of `"closedform"`, `"bootstrap"`, `"bypass"` (weighted algebra
   * with no error calculation), or `"exact"` (routed to the base table /
   * no sample involved). */
  def analysisOf(df: DataFrame): String = analysisOf(df.queryExecution.analyzed)

  def analysisOf(plan: LogicalPlan): String = {
    def has(p: Any => Boolean): Boolean =
      plan.exists(_.expressions.exists(_.exists(e => p(e))))
    if (has(_.isInstanceOf[ClosedFormAggregate])) "closedform"
    else if (has(_.isInstanceOf[BootstrapAggregate])) "bootstrap"
    else if (has(_.isInstanceOf[MapColumnToWeight])) "bypass"
    else "exact"
  }

  /** True when the plan CONSUMES a sample's weight column (any estimator
   * family). Mere presence of the weightage column in a scan's output does
   * not count — a routed-to-base query over a raw weighted table still
   * carries the column without weighting by it. */
  def usesSample(df: DataFrame): Boolean =
    analysisOf(df.queryExecution.analyzed) != "exact"
}
