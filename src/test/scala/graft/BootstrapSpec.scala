package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._
import graft.sampling.StratifiedSampler

class BootstrapSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")
  private def seedCol = xxhash64(col("l_orderkey"), col("l_linenumber"), lit(7))

  test("trial 0 equals the plain weighted estimate; CI brackets it") {
    val s = StratifiedSampler.sample(li, Seq("l_returnflag"), fraction = 0.2)
    val r = s.groupBy("l_returnflag")
      .agg(
        approx_sum_bootstrap(col("l_quantity"), col(weightColumn), seedCol).as("b"),
        weighted_sum(col("l_quantity")).as("w"))
      .select(col("l_returnflag"), estimate(col("b")), col("w"),
        lower_bound(col("b")), upper_bound(col("b")))
      .collect()
    r.foreach { row =>
      val (est, w, lb, ub) = (row.getDouble(1), row.getDouble(2),
        row.getDouble(3), row.getDouble(4))
      assert(math.abs(est - w) < 1e-9, "trial 0 must be the unperturbed estimate")
      assert(lb <= est + 1e-9 && est <= ub + 1e-9)
    }
  }

  test("bootstrap is deterministic for fixed sample + seed") {
    val s = StratifiedSampler.sample(li, Seq("l_returnflag"), fraction = 0.1).cache()
    s.count()
    def run() = s.groupBy("l_returnflag")
      .agg(approx_avg_bootstrap(col("l_extendedprice"), col(weightColumn), seedCol).as("b"))
      .select(col("l_returnflag"), estimate(col("b")), absolute_error(col("b")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(run() === run())
    s.unpersist()
  }

  test("bootstrap CI close to closed-form CI on the same sample") {
    val s = StratifiedSampler.sample(li, Seq("l_returnflag"), fraction = 0.2).cache()
    s.count()
    val r = s.agg(
      approx_sum_bootstrap(col("l_quantity"), col(weightColumn), seedCol).as("b"),
      approx_sum(col("l_quantity"), col(weightColumn)).as("c"))
      .select(absolute_error(col("b")), absolute_error(col("c")),
        estimate(col("b")), estimate(col("c"))).collect()(0)
    val (bAbs, cAbs) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-9)
    // both are 95% CIs of the same estimator — same order of magnitude
    assert(bAbs > 0 && cAbs > 0 && bAbs / cAbs > 0.3 && bAbs / cAbs < 3.0,
      s"bootstrap abs=$bAbs vs closed-form abs=$cAbs")
    s.unpersist()
  }

  test("count bootstrap estimates total rows") {
    val s = StratifiedSampler.sample(li, Seq("l_returnflag"), fraction = 0.15)
    val r = s.agg(approx_count_bootstrap(col("l_quantity"), col(weightColumn), seedCol).as("b"))
      .select(estimate(col("b"))).collect()(0).getDouble(0)
    val exact = li.count().toDouble
    assert(math.abs(r / exact - 1.0) < 0.05)
  }

  test("SQL path with spark.sql.aqp.estimator=bootstrap") {
    val gs = new GraftSession(spark)
    li.createOrReplaceTempView("lineitem_bs")
    gs.sql("CREATE SAMPLE TABLE li_bs_sample ON lineitem_bs OPTIONS(qcs 'l_returnflag', fraction '0.2')")
    spark.conf.set("spark.sql.aqp.estimator", "bootstrap")
    try {
      val rows = gs.sql(
        """SELECT l_returnflag, sum(l_quantity) AS s,
          |       absolute_error(s) AS ae, relative_error(s) AS re
          |FROM lineitem_bs GROUP BY l_returnflag WITH ERROR 0.5""".stripMargin).collect()
      val exact = li.groupBy("l_returnflag").agg(sum("l_quantity")).collect()
        .map(x => x.getString(0) -> x.getDouble(1)).toMap
      rows.foreach { r =>
        assert(r.getDouble(2) > 0.0)
        assert(math.abs(r.getDouble(1) - exact(r.getString(0))) / exact(r.getString(0)) < 0.2)
      }
    } finally {
      spark.conf.unset("spark.sql.aqp.estimator")
      gs.dropSampleTable("li_bs_sample")
    }
  }
}
