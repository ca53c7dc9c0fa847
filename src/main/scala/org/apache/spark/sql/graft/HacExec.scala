package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualNullSafe, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/**
 * Logical node enforcing the HAC (High-level Accuracy Contract) behaviors
 * STRICT / RUN_ON_FULL_TABLE / PARTIAL_RUN_ON_BASE_TABLE over an
 * error-tracked aggregate result (reference `SampleTablePlan`,
 * `execution/common/AQPRules.scala:115-519`).
 *
 * `child` produces the visible output plus `nHidden` trailing hidden
 * relative-error columns; `fallback` is the original un-sampled plan (same
 * visible output attrs), kept OFF the child list so the optimizer/planner
 * only touch it if HAC actually reroutes.
 */
case class HacEnforcement(
    child: LogicalPlan,
    fallback: LogicalPlan,
    behavior: HacBehavior.HacBehavior,
    errorLimit: Double,
    nHidden: Int,
    keyIndices: Seq[Int],
    sortOrder: Seq[SortOrder]) extends UnaryNode {
  override def output: Seq[Attribute] = child.output.dropRight(nHidden)
  override protected def withNewChildInternal(newChild: LogicalPlan): HacEnforcement =
    copy(child = newChild)
}

case class HacStrategy(spark: org.apache.spark.sql.SparkSession) extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case h: HacEnforcement =>
      HacExec(planLater(h.child), h.fallback, h.behavior, h.errorLimit,
        h.nHidden, h.keyIndices, h.sortOrder) :: Nil
    case _ => Nil
  }
}

/**
 * Physical HAC enforcement.
 *
 *  - STRICT: fully distributed — any row over the limit throws
 *    [[ErrorLimitExceededException]] executor-side.
 *  - RUN_ON_FULL_TABLE: collects the (post-aggregation, hence small) result;
 *    if any group fails, re-executes the stashed base-table plan.
 *  - PARTIAL_RUN_ON_BASE_TABLE: collects, splits pass/fail groups, re-runs
 *    the base plan semi-joined to the failing group keys, unions with the
 *    passing sampled rows and re-applies the original sort
 *    (reference `AQPRules.scala:375-479`).
 *
 * The driver-side collect only ever sees aggregated output (group count
 * rows), mirroring the reference's own `collect()` of failing keys.
 */
case class HacExec(
    child: SparkPlan,
    fallback: LogicalPlan,
    behavior: HacBehavior.HacBehavior,
    errorLimit: Double,
    nHidden: Int,
    keyIndices: Seq[Int],
    sortOrder: Seq[SortOrder]) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output.dropRight(nHidden)

  private def overLimit(row: InternalRow, total: Int): Boolean = {
    var i = total - nHidden
    while (i < total) {
      if (!row.isNullAt(i) && row.getDouble(i) > errorLimit) return true
      i += 1
    }
    false
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val total = child.output.size
    val visible = output
    val childOutput = child.output
    val limit = errorLimit
    val nHid = nHidden

    behavior match {
      case HacBehavior.Strict =>
        child.execute().mapPartitions { iter =>
          val proj = UnsafeProjection.create(visible, childOutput)
          iter.map { row =>
            var i = total - nHid
            while (i < total) {
              if (!row.isNullAt(i) && row.getDouble(i) > limit) {
                throw new ErrorLimitExceededException(
                  s"relative error ${row.getDouble(i)} exceeds limit $limit " +
                    "(BEHAVIOR 'strict')")
              }
              i += 1
            }
            proj(row)
          }
        }

      case HacBehavior.RerouteToBase | HacBehavior.PartialRouting =>
        val rows = child.executeCollect()
        val (failing, passing) = rows.partition(overLimit(_, total))
        val proj = UnsafeProjection.create(visible, childOutput)
        val passingVisible = passing.map(r => proj(r).copy().asInstanceOf[InternalRow]).toIndexedSeq

        if (failing.isEmpty) {
          sparkContext.parallelize(passingVisible, 1)
        } else if (behavior == HacBehavior.RerouteToBase || keyIndices.isEmpty) {
          Dataset.ofRows(session, fallback).queryExecution.toRdd
        } else {
          // partial: exact results only for the failing group keys. Built
          // name-based through the DataFrame API — raw attr plumbing across
          // Union children shares exprIds and breaks under re-analysis
          // (DeduplicateRelations re-aliases one side).
          val keyAttrs = keyIndices.map(visible)
          val keyProj = UnsafeProjection.create(keyAttrs, childOutput)
          val keyRows = failing.map(r => keyProj(r).copy().asInstanceOf[InternalRow])
            .distinct.toIndexedSeq
          val keyNames = keyAttrs.map(_.name)
          val keysDf = Dataset.ofRows(session,
            LocalRelation(keyAttrs.map(_.newInstance()), keyRows))
          val passingDf = Dataset.ofRows(session,
            LocalRelation(visible.map(_.newInstance()), passingVisible))
          val fallbackDf = Dataset.ofRows(session, fallback)
          val failedExact = fallbackDf.join(keysDf, keyNames, "left_semi")
          var merged = passingDf.unionByName(failedExact)
          val sortCols = sortOrder.flatMap { so =>
            so.child match {
              case a: Attribute => visible.find(_.exprId == a.exprId).map { va =>
                import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, NullsFirst, NullsLast}
                val c = org.apache.spark.sql.functions.col(va.name)
                (so.direction, so.nullOrdering) match {
                  case (Ascending, NullsFirst) => c.asc_nulls_first
                  case (Ascending, NullsLast) => c.asc_nulls_last
                  case (Descending, NullsFirst) => c.desc_nulls_first
                  case (Descending, NullsLast) => c.desc_nulls_last
                }
              }
              case _ => None
            }
          }
          if (sortCols.nonEmpty) merged = merged.orderBy(sortCols: _*)
          merged.queryExecution.toRdd
        }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): HacExec =
    copy(child = newChild)
}
