package graft

import org.apache.commons.math3.distribution.{NormalDistribution, TDistribution}
import org.apache.spark.sql.graft.Weightage
import org.scalatest.funsuite.AnyFunSuite

/**
 * Golden standard-deviation parity, in the spirit of the reference's
 * `ClosedFormGoldenSDSuite` / `ClosedFormAccuracySuite`: the engine's
 * `absolute_error` must equal the analytic stratified-sampling standard
 * error recomputed INDEPENDENTLY on the driver from the sample's own rows
 * (decoding the packed weight per stratum), for sum / avg / count, grouped
 * across strata and filtered into the Student-t branch. This pins the whole
 * distributed pipeline — weight packing, per-cell accumulation, partial
 * merges across partitions, and the confidence factor — against the
 * textbook domain-estimation formula
 *   Var(sum) = Σ_h N_h (N_h − n_h) s²_{h,cell} / (n_h − 1)
 * with cell moments taken over the stratum's full sampled count.
 */
class GoldenSdSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {
  import TestSpark._

  private val conf = 0.95

  override def afterAll(): Unit = {
    GraftState.of(TestSpark.spark).samples.keys
      .filter(_.startsWith("li_gsd")).toSeq
      .foreach(new GraftSession(TestSpark.spark).dropSampleTable)
    super.afterAll()
  }

  private lazy val gs: GraftSession = {
    val g = new GraftSession(spark)
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li_gsd")
    g.sql("CREATE SAMPLE TABLE li_gsd_s ON li_gsd " +
      "OPTIONS(qcs 'l_returnflag', fraction '0.1', seed '7')")
    g
  }

  /** Replicates the documented closed-form math from raw (group, rawWeight,
   * value) triples: per-cell moments over the stratum's sampled count,
   * FPC multiplier, z/t at n = 30, and the small-estimate relError clamp. */
  private def analytic(rows: Seq[(String, Long, Double)], agg: String)
      : Map[String, (Double, Double, Double)] = {
    rows.groupBy(_._1).map { case (g, rs) =>
      val cells = rs.groupBy(_._2)
      var weightedCount = 0.0
      var trueSum = 0.0
      var nvariance = 0.0
      var totalN = 0L
      cells.foreach { case (raw, cell) =>
        val l = Weightage.numSamples(raw)
        val r = Weightage.stratumTotal(raw)
        val w = if (raw == 0L || l == 0L) 1.0 else r.toDouble / l.toDouble
        val n = cell.size
        val sum = cell.map(_._3).sum
        val sumSq = cell.map(v => v._3 * v._3).sum
        weightedCount += n * w
        trueSum += (if (agg == "count") n * w else sum * w)
        totalN += n
        if (l != 0L) {
          val lw = l.toDouble
          val mulFactor = r.toDouble * (r.toDouble - lw) / (lw - 1.0)
          val strataVar =
            if (agg == "count") (n / lw) * (1.0 - n / lw)
            else { val m = sum / lw; sumSq / lw - m * m }
          val cfVar = mulFactor * strataVar
          if (!cfVar.isNaN && cfVar >= 0.0) nvariance += cfVar
        }
      }
      val est = agg match {
        case "count" => weightedCount
        case "sum" => trueSum
        case "avg" => trueSum / weightedCount
      }
      val stdDev =
        if (agg == "avg") math.sqrt(nvariance / (weightedCount * weightedCount))
        else math.sqrt(nvariance)
      val confFactor =
        if (totalN >= 30) new NormalDistribution(0, 1)
          .inverseCumulativeProbability(0.5 + conf / 2.0)
        else new TDistribution(math.max(1.0, (totalN - 1).toDouble))
          .inverseCumulativeProbability(0.5 + conf / 2.0)
      val bound = stdDev * confFactor
      val rel =
        if (est < -1 || est > 1) math.abs(bound / est)
        else math.abs(bound / (math.abs(est) + 1))
      g -> (est, math.abs(bound), rel)
    }
  }

  private def close(a: Double, b: Double, what: String): Unit =
    assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b))),
      s"$what: engine $a vs analytic $b")

  test("sum/avg/count absolute_error equals the analytic stratified SE (z branch)") {
    gs
    val sampleRows = spark.sql(
      s"SELECT l_linestatus, ${Weightage.WeightColumn}, l_extendedprice FROM li_gsd_s")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    for (agg <- Seq("sum", "avg", "count")) {
      val expr = agg match {
        case "sum" => "sum(l_extendedprice)"
        case "avg" => "avg(l_extendedprice)"
        case "count" => "count(l_extendedprice)"
      }
      val got = gs.sql(
        s"""SELECT l_linestatus AS g, $expr AS x, absolute_error(x) AS ae,
           |       relative_error(x) AS re
           |FROM li_gsd GROUP BY 1 WITH ERROR 0.95 CONFIDENCE $conf""".stripMargin)
        .collect().map(r => r.getString(0) ->
          (if (agg == "count") r.getLong(1).toDouble else r.getDouble(1),
            r.getDouble(2), r.getDouble(3))).toMap
      val want = analytic(sampleRows, agg)
      assert(got.keySet === want.keySet, s"[$agg] group sets differ")
      got.foreach { case (g, (est, ae, re)) =>
        val (wEst, wAe, wRe) = want(g)
        // count round-trips through an integral cast in the projection
        if (agg == "count") assert(est === math.round(wEst).toDouble)
        else close(est, wEst, s"[$agg/$g] estimate")
        close(ae, wAe, s"[$agg/$g] absolute_error")
        close(re, wRe, s"[$agg/$g] relative_error")
      }
    }
  }

  test("Student-t branch (n < 30 per group) matches the analytic SE too") {
    gs
    val sampleRows = spark.sql(
      s"""SELECT l_linestatus, ${Weightage.WeightColumn}, l_extendedprice
         |FROM li_gsd_s WHERE l_quantity > 48""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assume(sampleRows.nonEmpty && sampleRows.groupBy(_._1).forall(_._2.size < 30),
      "filter should land every group under 30 sampled rows")
    val got = gs.sql(
      s"""SELECT l_linestatus AS g, sum(l_extendedprice) AS x,
         |       absolute_error(x) AS ae
         |FROM li_gsd WHERE l_quantity > 48
         |GROUP BY 1 WITH ERROR 0.95 CONFIDENCE $conf""".stripMargin)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val want = analytic(sampleRows, "sum")
    assert(got.keySet === want.keySet)
    got.foreach { case (g, (est, ae)) =>
      close(est, want(g)._1, s"[t/$g] estimate")
      close(ae, want(g)._2, s"[t/$g] absolute_error")
    }
  }

  test("seed calibration: CIs from independent seeds cover the truth") {
    gs
    val truth = spark.sql("SELECT sum(l_extendedprice) FROM li_gsd")
      .collect()(0).getDouble(0)
    val estimates = (1 to 20).map { k =>
      gs.sql("CREATE SAMPLE TABLE li_gsd_cal ON li_gsd " +
        s"OPTIONS(qcs 'l_returnflag', fraction '0.15', seed '${1000 + k}')")
      try {
        val r = gs.sql(
          """SELECT sum(l_extendedprice) AS x, lower_bound(x) AS lb,
            |       upper_bound(x) AS ub
            |FROM li_gsd WITH ERROR 0.9 CONFIDENCE 0.95""".stripMargin).collect()(0)
        (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      } finally gs.dropSampleTable("li_gsd_cal")
    }
    // seeds actually vary the draw
    assert(estimates.map(_._1).distinct.size > 10,
      "independent seeds must produce different samples")
    // a 95% CI should cover the truth almost always; 20 draws at >=70%
    // keeps the test deterministic-ish while still catching a mis-scaled SE
    val covered = estimates.count { case (_, lb, ub) => lb <= truth && truth <= ub }
    assert(covered >= 14, s"only $covered/20 CIs covered the truth $truth")
  }
}
