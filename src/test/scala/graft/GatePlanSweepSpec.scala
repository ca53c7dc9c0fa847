package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Plan-regression firewall over EVERY driver-contract gate query: builds
 * each `SparkEntry.queries` DataFrame (running whatever DDL/fixture its
 * construction needs) and asserts the physical plan contains no
 * CartesianProduct — the one join shape that is a scale bug wherever it
 * appears (an all-pairs product of two distributed inputs). A dedup or
 * ANN operator silently degrading to all-pairs, or a join losing its
 * equi-condition in a refactor, fails here long before a benchmark
 * regresses. BroadcastNestedLoopJoin is NOT banned: our plans use it only
 * to broadcast provably tiny sides (bucket offsets, mix thresholds),
 * which is the correct shape. SortMergeJoin is likewise legitimate for
 * big-big joins.
 */
class GatePlanSweepSpec extends AnyFunSuite {
  import TestSpark._

  test("no gate query plans a CartesianProduct") {
    // the gate constructions register full-fraction samples and TopK
    // tables over the SAME parquet files every other suite reads, and
    // sample matching is plan-based — leaving them registered would
    // silently re-route other suites' queries (exactly the trap the
    // SQL-vs-DF fuzz documents). Snapshot and restore the catalog.
    val state = GraftState.of(spark)
    val samplesBefore = state.samples.keySet.toSet
    val topksBefore = state.topks.keySet.toSet
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sf).queryExecution.executedPlan.toString
          if (plan.contains("CartesianProduct")) offenders += name
        } catch {
          case e: Throwable => failures += s"$name: ${e.getMessage}"
        }
      }
    } finally {
      val gs = new GraftSession(spark)
      (state.samples.keySet.toSet -- samplesBefore).foreach { n =>
        try gs.dropSampleTable(n) catch { case _: Exception => }
      }
      (state.topks.keySet.toSet -- topksBefore).foreach { n =>
        try gs.sql(s"DROP TOPK TABLE IF EXISTS $n") catch { case _: Exception => }
      }
    }
    assert(failures.isEmpty, s"gate construction failed:\n${failures.mkString("\n")}")
    assert(offenders.isEmpty,
      s"gates planning a CartesianProduct: ${offenders.mkString(", ")}")
  }
}
