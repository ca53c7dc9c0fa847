package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._
import graft.sampling.StratifiedSampler

/** Statistical-accuracy suite in the spirit of the reference's
 * `ClosedFormAccuracySuite` / `BootStrapAccuracySuite`: across many groups,
 * the 95% confidence intervals must contain the truth at roughly the nominal
 * rate (fixed seed → deterministic, bound set loosely at 80%). */
class CoverageSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")
    .withColumn("grp", (col("l_orderkey") % 50).cast("int"))

  private def coverage(estimator: String): Double = {
    val s = StratifiedSampler.sample(li, Seq("grp"), fraction = 0.3,
      reservoirSize = 20, seed = 11L)
    val seed = xxhash64(col("l_orderkey"), col("l_linenumber"), lit(3))
    val aggCol = estimator match {
      case "closedform" => approx_sum(col("l_extendedprice"), col(weightColumn))
      case "bootstrap" => approx_sum_bootstrap(col("l_extendedprice"), col(weightColumn), seed)
    }
    val est = s.groupBy("grp").agg(aggCol.as("x"))
      .select(col("grp"), lower_bound(col("x")), upper_bound(col("x")))
      .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val truth = li.groupBy("grp").agg(sum("l_extendedprice")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val hits = truth.count { case (g, t) =>
      est.get(g).exists { case (lb, ub) => lb <= t && t <= ub }
    }
    hits.toDouble / truth.size
  }

  test("closed-form 95% CIs cover the truth across 50 groups") {
    val c = coverage("closedform")
    assert(c >= 0.8, s"coverage $c below 0.8")
  }

  test("bootstrap 95% CIs cover the truth across 50 groups") {
    val c = coverage("bootstrap")
    assert(c >= 0.8, s"coverage $c below 0.8")
  }

  // AVG is the ratio estimator — the closed-form variance is the delta-
  // method approximation the reference switches away from under WHERE
  // (estimator=auto). Its CI coverage must still hold on plain grouped avgs.
  private def avgCoverage(estimator: String): Double = {
    val s = StratifiedSampler.sample(li, Seq("grp"), fraction = 0.3,
      reservoirSize = 20, seed = 13L)
    val seed = xxhash64(col("l_orderkey"), col("l_linenumber"), lit(5))
    val aggCol = estimator match {
      case "closedform" => approx_avg(col("l_extendedprice"), col(weightColumn))
      case "bootstrap" =>
        approx_avg_bootstrap(col("l_extendedprice"), col(weightColumn), seed)
    }
    val est = s.groupBy("grp").agg(aggCol.as("x"))
      .select(col("grp"), lower_bound(col("x")), upper_bound(col("x")))
      .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val truth = li.groupBy("grp").agg(avg("l_extendedprice")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    truth.count { case (g, t) =>
      est.get(g).exists { case (lb, ub) => lb <= t && t <= ub }
    }.toDouble / truth.size
  }

  test("closed-form avg (ratio estimator) 95% CIs cover the truth across 50 groups") {
    val c = avgCoverage("closedform")
    assert(c >= 0.8, s"avg coverage $c below 0.8")
  }

  test("bootstrap avg 95% CIs cover the truth across 50 groups") {
    val c = avgCoverage("bootstrap")
    assert(c >= 0.8, s"avg coverage $c below 0.8")
  }
}
