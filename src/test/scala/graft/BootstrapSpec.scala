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

  // reference `SnappyAQPSessionState.scala:71-81` AqpDebugFixedSeed: a debug
  // seed replaces the per-row content hash, so the Poisson stream no longer
  // depends on row content — two runs that would content-hash differently
  // (different spark.sql.aqp.seed) still produce bit-identical bounds.
  test("spark.sql.aqp.debug.fixedSeed pins bounds independent of content hash") {
    val gs = new GraftSession(spark)
    li.createOrReplaceTempView("lineitem_fs")
    gs.sql("CREATE SAMPLE TABLE li_fs_sample ON lineitem_fs " +
      "OPTIONS(qcs 'l_returnflag', fraction '0.2')")
    spark.conf.set("spark.sql.aqp.estimator", "bootstrap")
    def run(): Seq[(String, Double, Double, Double)] = gs.sql(
      """SELECT l_returnflag, sum(l_quantity) AS s,
        |       lower_bound(s) AS lb, upper_bound(s) AS ub
        |FROM lineitem_fs GROUP BY l_returnflag ORDER BY l_returnflag
        |WITH ERROR 0.5""".stripMargin).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSeq
    try {
      spark.conf.set("spark.sql.aqp.debug.fixedSeed", "5")
      val r1 = run()
      spark.conf.set("spark.sql.aqp.seed", "99") // would change the content hash
      val r2 = run()
      assert(r1 === r2, "fixed seed must ignore the content-hash seed")
      spark.conf.unset("spark.sql.aqp.debug.fixedSeed")
      val r3 = run() // content-hash path with a different base seed
      assert(r1.map(_._2) === r3.map(_._2), "trial-0 estimate is seed-free")
      assert(r1.map(t => (t._3, t._4)) !== r3.map(t => (t._3, t._4)),
        "bounds must come from different Poisson draws once the fixed seed is lifted")
    } finally {
      spark.conf.unset("spark.sql.aqp.debug.fixedSeed")
      spark.conf.unset("spark.sql.aqp.seed")
      spark.conf.unset("spark.sql.aqp.estimator")
      gs.dropSampleTable("li_fs_sample")
    }
  }

  // reference AQPDebugPoissonType: a fixed multiplicity-1 "Poisson" makes
  // every trial the unperturbed estimate — the CI collapses to a point,
  // which is the support knob for isolating resampling noise from weighting
  // bugs when reproducing a customer run.
  test("spark.sql.aqp.debug.poisson=fixed collapses the CI to the estimate") {
    val gs = new GraftSession(spark)
    li.createOrReplaceTempView("lineitem_fp")
    gs.sql("CREATE SAMPLE TABLE li_fp_sample ON lineitem_fp " +
      "OPTIONS(qcs 'l_returnflag', fraction '0.2')")
    spark.conf.set("spark.sql.aqp.estimator", "bootstrap")
    spark.conf.set("spark.sql.aqp.debug.poisson", "fixed")
    try {
      val rows = gs.sql(
        """SELECT l_returnflag, sum(l_quantity) AS s,
          |       lower_bound(s) AS lb, upper_bound(s) AS ub,
          |       absolute_error(s) AS ae
          |FROM lineitem_fp GROUP BY l_returnflag WITH ERROR 0.9""".stripMargin)
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getDouble(2) === r.getDouble(1))
        assert(r.getDouble(3) === r.getDouble(1))
        assert(r.getDouble(4) === 0.0)
      }
    } finally {
      spark.conf.unset("spark.sql.aqp.debug.poisson")
      spark.conf.unset("spark.sql.aqp.estimator")
      gs.dropSampleTable("li_fp_sample")
    }
  }

  // The aggregate itself is layout-independent for ANY per-row seed because
  // update order never matters: with a constant (debug) seed every row draws
  // the identical stream, and merge is a commutative sum.
  test("constant-seed bootstrap identical under repartition and coalesce") {
    val s = StratifiedSampler.sample(li, Seq("l_returnflag"), fraction = 0.15).cache()
    s.count()
    def run(df: org.apache.spark.sql.DataFrame) = df.groupBy("l_returnflag")
      .agg(approx_sum_bootstrap(col("l_quantity"), col(weightColumn), lit(5L)).as("b"))
      .select(col("l_returnflag"), estimate(col("b")),
        lower_bound(col("b")), upper_bound(col("b")))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val a = run(s.repartition(7))
    val b = run(s.coalesce(1))
    assert(a.keySet === b.keySet)
    // multiplicities are bit-identical per row; the sums reassociate across
    // layouts, so allow double-rounding ulps but nothing statistical
    a.foreach { case (k, (e1, l1, u1)) =>
      val (e2, l2, u2) = b(k)
      Seq((e1, e2), (l1, l2), (u1, u2)).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 1e-9 * math.max(math.abs(x), 1.0),
          s"$k: $x vs $y")
      }
    }
    s.unpersist()
  }
}
