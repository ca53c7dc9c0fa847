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

  test("q17's dim join degrades to a shuffle join when the dim outgrows broadcast") {
    // the 100 TB default is dims-stay-broadcastable, but a dimension CAN
    // outgrow the broadcast threshold at scale (100x orders/customer) and
    // the sample-routed join must then take the shuffle-join shape — not
    // hit a plan cliff (a hardcoded broadcast hint OOMs the driver at
    // scale; a lost equi-condition becomes a cartesian). Simulate the
    // regime by disabling the broadcast thresholds, and pin that the
    // result is IDENTICAL to the broadcast-regime run — the physical
    // strategy flip must be invisible to query semantics.
    val state = GraftState.of(spark)
    val samplesBefore = state.samples.keySet.toSet
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    def run(): (Seq[String], String) = {
      val df = SparkEntry.queries("q17_join_with_error")(spark, sf)
      val rows = df.collect().map(_.toString).toSeq
      (rows, df.queryExecution.executedPlan.toString)
    }
    try {
      val (broadcastRows, broadcastPlan) = run()
      assert(broadcastPlan.contains("BroadcastHashJoin"),
        "fixture regime: the sf0.01 dim should broadcast by default")
      keys.foreach(k => spark.conf.set(k, "-1"))
      val (shuffleRows, shufflePlan) = run()
      assert(!shufflePlan.contains("CartesianProduct"),
        s"non-broadcast regime planned a cartesian:\n$shufflePlan")
      // the ONLY broadcasts allowed with thresholds disabled are the
      // sampler's explicitly-hinted per-stratum targets joins (bounded by
      // stratum count — `__graft_key__` rows — not by data size); a
      // broadcast of the DIM here means a hardcoded hint that would OOM
      // the driver when the dim outgrows memory at scale
      shufflePlan.linesIterator
        .filter(_.contains("BroadcastHashJoin")).foreach { l =>
          assert(l.contains("__graft_key__"),
            s"unbounded broadcast survives disabled thresholds: $l")
        }
      assert(shufflePlan.linesIterator.exists(l =>
        (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")) &&
          l.contains("o_orderkey")),
        s"expected a shuffle join shape for the oversized dim:\n$shufflePlan")
      assert(shuffleRows === broadcastRows,
        "join strategy flip must not change query results")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      val gs = new GraftSession(spark)
      (state.samples.keySet.toSet -- samplesBefore).foreach { n =>
        try gs.dropSampleTable(n) catch { case _: Exception => }
      }
    }
  }
}
