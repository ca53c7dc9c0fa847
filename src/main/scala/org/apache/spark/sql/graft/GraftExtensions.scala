package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `private[sql]` helpers surfaced for the public `graft` package. */
object Plans {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /**
   * Materialize a DataFrame into a persisted RDD-backed frame with O(1)
   * logical-plan depth — for iterative algorithms, where caching alone
   * keeps the ever-deepening logical lineage — plus a release handle that
   * frees the executor storage (localCheckpoint offers no explicit
   * release). The frame is NOT fault-tolerant to executor loss beyond
   * normal RDD recompute of the persisted map.
   */
  def materializeWithRdd(spark: SparkSession, df: DataFrame)
      : (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]) = {
    // Storage level is a session knob. MEMORY_AND_DISK (default) keeps the
    // hard "every scan reads one snapshot" guarantee: partitions that do not
    // fit spill to disk and are never recomputed, so even a nondeterministic
    // input stays frozen. MEMORY_ONLY trades that for recompute-on-eviction
    // — on a memory-tight harness disk spill serializes every consumer
    // behind disk I/O, while recompute re-scans only the evicted partitions.
    // Callers whose inputs are deterministic under rescan (e.g. the bench
    // harness) can safely opt in.
    val level = org.apache.spark.storage.StorageLevel.fromString(
      spark.conf.get("spark.graft.materialize.storageLevel", "MEMORY_AND_DISK"))
    val rdd = df.queryExecution.toRdd.map(_.copy()).persist(level)
    val out = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, df.schema)
    (out, rdd)
  }

  /**
   * Unpersist `rdd` as soon as the first query that reads it completes
   * (success or failure). For operator-internal persists whose final frame
   * escapes to the caller: the operator cannot unpersist synchronously (the
   * caller has not yet run the consuming action), and leaving the entry to
   * the GC-driven ContextCleaner lets a long-running bench accumulate dead
   * cache entries that evict each other. The frame stays CORRECT after
   * release — a second execution recomputes through the RDD lineage.
   *
   * Only Dataset-level actions fire `QueryExecutionListener`; if the caller
   * never executes the frame (or consumes it through the raw RDD), the
   * listener self-expires after a bounded number of unrelated queries and
   * the entry falls back to the ContextCleaner — the pre-existing backstop,
   * minus an ever-growing listener list.
   */
  def releaseAfterFirstUse(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[_]): Unit = {
    val lm = spark.listenerManager
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      private var unrelatedSeen = 0
      private def consumes(
          qe: org.apache.spark.sql.execution.QueryExecution): Boolean =
        qe.analyzed.exists {
          case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id == rdd.id
          case _ => false
        }
      private def fire(
          qe: org.apache.spark.sql.execution.QueryExecution): Unit =
        if (consumes(qe)) {
          rdd.unpersist(blocking = false)
          lm.unregister(this)
        } else {
          unrelatedSeen += 1
          if (unrelatedSeen > 256) lm.unregister(this) // ContextCleaner backstop
        }
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = fire(qe)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = fire(qe)
    }
    lm.register(listener)
  }

  /** Block until queued listener-bus events (including
   * `QueryExecutionListener` callbacks, which fire asynchronously) have
   * been delivered — lets tests assert release side effects
   * deterministically. */
  def flushListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** DataFrame over a V1 `BaseRelation` (for relation-backed temp views,
   * e.g. the TopK scan with filter pushdown). */
  def relationDf(spark: SparkSession,
      rel: org.apache.spark.sql.sources.BaseRelation): DataFrame =
    ofRows(spark,
      org.apache.spark.sql.execution.datasources.LogicalRelation(rel))

  /** Ensure runtime hooks (error functions + HAC strategy) are installed on
   * a stock session — lets the engine work without `spark.sql.extensions`.
   */
  def install(spark: SparkSession): Unit = {
    ErrorEstimateStub.names.foreach { fn =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        fn, exprs => ErrorEstimateStub(fn, exprs.head), "built-in")
    }
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!cs.experimental.extraStrategies.exists(_.isInstanceOf[HacStrategy])) {
      cs.experimental.extraStrategies =
        cs.experimental.extraStrategies :+ HacStrategy(spark)
    }
  }
}

/**
 * `SparkSessionExtensions` installer — the "proper" wiring when the session
 * is built with `.withExtensions(new GraftExtensions)` or
 * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
 * (reference wires the same surface through `SnappyAQPSessionState`,
 * SURVEY.md §3/§4). `GraftSession` installs the equivalent hooks at runtime
 * for stock sessions.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectParser((session, delegate) => new AqpParser(delegate, Some(session)))
    // post-hoc, not resolution: the rewrite expects the settled post-analysis
    // plan shape (lateral column aliases already split into stacked
    // Projects), exactly what GraftSession.sql hands it on the standalone
    // path; inside the resolution fixed-point it would see intermediate
    // shapes with error-fn stubs still inline in the Aggregate
    e.injectPostHocResolutionRule(session => AqpRewrite(session))
    e.injectPlannerStrategy(session => HacStrategy(session))
    ErrorEstimateStub.names.foreach { fn =>
      e.injectFunction((
        FunctionIdentifier(fn),
        new ExpressionInfo(classOf[ErrorEstimateStub].getName, fn),
        (exprs: Seq[Expression]) => ErrorEstimateStub(fn, exprs.head)))
    }
  }
}
