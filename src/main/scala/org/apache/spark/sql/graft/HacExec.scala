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
 *  - RUN_ON_FULL_TABLE: caches the aggregated result on executors, checks
 *    for any failing group with a distributed take(1); if one exists,
 *    re-executes the stashed base-table plan.
 *  - PARTIAL_RUN_ON_BASE_TABLE: splits pass/fail groups with distributed
 *    filters over the cached result, re-runs the base plan semi-joined to
 *    the failing-key DataFrame, unions with the passing sampled rows and
 *    re-applies the original sort (reference `AQPRules.scala:375-479`).
 *
 * Unlike the reference (which collects the whole aggregated output to the
 * driver to decide pass/fail — `AQPRules.scala:312-321`), no path here
 * materializes group rows driver-side, so a high-cardinality GROUP BY under
 * partial routing stays executor-resident at any scale.
 */
case class HacExec(
    child: SparkPlan,
    // transient: the fallback logical plan (and anything it references, e.g.
    // file indexes) is only ever planned driver-side in doExecute; when a
    // parent operator (LIMIT above the enforcement node) serializes the plan
    // tree into a task closure, the fallback must not ride along
    @transient fallback: LogicalPlan,
    behavior: HacBehavior.HacBehavior,
    errorLimit: Double,
    nHidden: Int,
    keyIndices: Seq[Int],
    sortOrder: Seq[SortOrder]) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output.dropRight(nHidden)

  override protected def doExecute(): RDD[InternalRow] = {
    val total = child.output.size
    val visible = output
    val childOutput = child.output
    val limit = errorLimit
    val nHid = nHidden

    behavior match {
      case HacBehavior.Strict =>
        // strict is a declarative StrictErrorCheck Filter above the query's
        // sort/limit (AqpRewrite) — it never reaches this node
        throw new IllegalStateException(
          "BEHAVIOR 'strict' is enforced by StrictErrorCheck, not HacExec")

      case HacBehavior.RerouteToBase | HacBehavior.PartialRouting =>
        // Distributed failure detection. The reference collects every
        // aggregated row to the driver to decide pass/fail
        // (`AQPRules.scala:312-321`) — at scale a high-cardinality GROUP BY
        // under partial routing would materialize every group driver-side.
        // Here the aggregated result stays cached on executors, pass/fail
        // splitting is a distributed filter, and only the reroute DECISION
        // (take(1) on the failing subset) touches the driver.
        // The cache feeds the lazily-consumed result RDD on the no-failure
        // and partial paths, so it cannot be released synchronously there;
        // it is explicitly dropped on the full-reroute path and otherwise
        // reclaimed by the ContextCleaner when the result RDD is GC'd.
        val persisted = child.execute().map(_.copy())
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val failsLimit = (row: InternalRow) => {
          var i = total - nHid
          var f = false
          while (i < total && !f) {
            if (!row.isNullAt(i) && row.getDouble(i) > limit) f = true
            i += 1
          }
          f
        }
        val anyFailing = persisted.filter(failsLimit).take(1).nonEmpty

        if (!anyFailing) {
          persisted.mapPartitions { iter =>
            val proj = UnsafeProjection.create(visible, childOutput)
            iter.map(proj(_))
          }
        } else if (behavior == HacBehavior.RerouteToBase || keyIndices.isEmpty) {
          val res = Dataset.ofRows(session, fallback).queryExecution.toRdd
          persisted.unpersist(blocking = false)
          res
        } else {
          // partial: exact results only for the failing group keys. Built
          // name-based through the DataFrame API — raw attr plumbing across
          // Union children shares exprIds and breaks under re-analysis
          // (DeduplicateRelations re-aliases one side). The failing-key set
          // never lands on the driver: it feeds the semi-join as an RDD-
          // backed DataFrame (semi-join semantics make de-duplication free).
          val keyAttrs = keyIndices.map(visible)
          val keyNames = keyAttrs.map(_.name)
          val passingRdd = persisted.filter(r => !failsLimit(r)).mapPartitions { iter =>
            val proj = UnsafeProjection.create(visible, childOutput)
            iter.map(proj(_).copy().asInstanceOf[InternalRow])
          }
          val keysRdd = persisted.filter(failsLimit).mapPartitions { iter =>
            val proj = UnsafeProjection.create(keyAttrs, childOutput)
            iter.map(proj(_).copy().asInstanceOf[InternalRow])
          }
          import org.apache.spark.sql.catalyst.types.DataTypeUtils
          val passingDf = session.internalCreateDataFrame(passingRdd,
            DataTypeUtils.fromAttributes(visible))
          val keysDf = session.internalCreateDataFrame(keysRdd,
            DataTypeUtils.fromAttributes(keyAttrs))
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
