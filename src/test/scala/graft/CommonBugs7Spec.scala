package graft

import java.util.SplittableRandom

import org.apache.spark.sql.graft.{AqpInfo, BootstrapAggregate}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * Round-9 tranche: the last two un-mined reference estimator suites.
 *
 * Closed-form half (reference `ClosedFormEstimatesSuite.scala:121-335`,
 * airline schema transposed to lineitem):
 *  - HAVING on absolute_error equals post-filtering the same query;
 *  - the (UB−LB)/2 ≈ AE identity per row for avg/sum/count on the base
 *    table, for a direct sample-table query, at the suite's confidences
 *    (.9/.95/.8) — the reference's `verifyResult`;
 *  - HAC strict raises ErrorLimitExceededException;
 *  - LOCAL_OMIT: mixed avg/sum queries null failing cells, and an omitted
 *    COUNT reports the reference's −1 marker (`closedFormError.scala:162`
 *    `pointEstimate = if (aggType != Count) NaN else -1`) with its error
 *    columns nulled;
 *  - the analysis-type rule (avg+WHERE → bootstrap, plain avg → closed
 *    form) is PlanShapeSpec's estimator-auto test — not repeated here.
 *
 * Bootstrap half (reference `BootStrapAggregateFunctionPart2Test.scala:
 * 179-287`): with the debug fixed seed every row draws the SAME Poisson
 * multiplicity stream, so the trial vector is reproducible driver-side —
 * trial i of a sum is mᵢ·estimate, of a count mᵢ·Σw, of an avg exactly the
 * estimate. That pins end-to-end: trial generation, the zero-multiplicity
 * trial exclusion (wcnt=0), and the reference's quantile indexes
 * lb = sorted(⌊n·(1−c)/2⌋), ub = sorted(⌈n·(1+c)/2⌉−1)
 * (`BootstrapFunctions.scala:174-175`, bit-identical FP formulas).
 */
class CommonBugs7Spec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._

  private lazy val gs: GraftSession = {
    val g = new GraftSession(spark)
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li_cb7")
    // the reference suite's sample shape: single-column QCS, 1% fraction,
    // reservoir 50 (ClosedFormEstimatesSuite.scala:100-113)
    g.sql("CREATE SAMPLE TABLE li_cb7_s ON li_cb7 " +
      "OPTIONS(qcs 'l_returnflag', fraction '0.01', strataReservoirSize '50')")
    g
  }

  override def afterAll(): Unit = {
    val g = new GraftSession(TestSpark.spark)
    GraftState.of(TestSpark.spark).samples.keys
      .filter(_.startsWith("li_cb7"))
      .toSeq.foreach(g.dropSampleTable)
    super.afterAll()
  }

  /** numeric cell read: the integral converter (SNAP-806) surfaces count
    * estimates/bounds as LONG while other aggregates stay DOUBLE */
  private def num(r: org.apache.spark.sql.Row, i: Int): Double = r.get(i) match {
    case l: java.lang.Long => l.toDouble
    case d: java.lang.Double => d
    case i2: java.lang.Integer => i2.toDouble
    case x => fail(s"non-numeric cell $x")
  }

  /** reference verifyResult: (UB − LB)/2 ≈ AE, row by row */
  private def verifyRow(t: Double, lb: Double, ub: Double, ae: Double): Unit = {
    val diff = math.abs(ub - lb) / 2 - ae
    assert(math.abs(diff) < 1e-4, s"(UB-LB)/2 != AE: $lb..$ub vs $ae (est $t)")
    assert(lb <= t + 1e-9 && t <= ub + 1e-9, s"estimate outside bounds")
  }

  test("closed form: HAVING on absolute_error equals post-filtering (Test0)") {
    gs
    val all = gs.sql(
      """SELECT avg(l_quantity) as T, absolute_error(T) as AE, l_returnflag
        |FROM li_cb7 GROUP BY l_returnflag ORDER BY l_returnflag
        |WITH ERROR 0.12 CONFIDENCE 0.9""".stripMargin).collect()
    val cuts = all.map(_.getDouble(1)).sorted
    assume(cuts.distinct.length >= 2, "need distinct AEs to split the groups")
    val cut = (cuts(0) + cuts(1)) / 2 // strictly between two group AEs
    val filtered = all.filter(_.getDouble(1) > cut)
    val having = gs.sql(
      s"""SELECT avg(l_quantity) as T, absolute_error(T) as AE, l_returnflag
         |FROM li_cb7 GROUP BY l_returnflag
         |HAVING absolute_error(T) > $cut ORDER BY l_returnflag
         |WITH ERROR 0.12 CONFIDENCE 0.9""".stripMargin).collect()
    assert(having.length === filtered.length)
    having.zip(filtered).foreach { case (h, f) =>
      assert(h.getString(2) === f.getString(2))
      assert(h.getDouble(0) === f.getDouble(0) && h.getDouble(1) === f.getDouble(1),
        "HAVING must not perturb the estimates it filters on")
    }
  }

  test("closed form: (UB-LB)/2 == AE for avg/sum/count on the base table (Tests 1-2b)") {
    gs
    for ((agg, conf) <- Seq(("avg", 0.9), ("sum", 0.95), ("count", 0.95))) {
      val rows = gs.sql(
        s"""SELECT $agg(l_quantity) as T, lower_bound(T) LB, upper_bound(T) UB,
           |relative_error(T) RE, absolute_error(T) as AE, l_returnflag
           |FROM li_cb7 GROUP BY l_returnflag
           |WITH ERROR 0.12 CONFIDENCE $conf""".stripMargin).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(!r.anyNull, s"$agg: do_nothing row must be fully populated")
        verifyRow(num(r, 0), num(r, 1), num(r, 2), num(r, 4))
      }
      assert(AqpInfo.analysisOf(gs.sql(
        s"""SELECT $agg(l_quantity) as T, absolute_error(T) FROM li_cb7
           |GROUP BY l_returnflag WITH ERROR 0.12 CONFIDENCE $conf""".stripMargin))
        === "closedform")
    }
  }

  test("closed form: direct query on the sample table keeps the identity (Test3)") {
    gs
    val rows = gs.sql(
      """SELECT avg(l_quantity) as T, lower_bound(T) LB, upper_bound(T) UB,
        |relative_error(T) RE, absolute_error(T) as AE, l_returnflag
        |FROM li_cb7_s GROUP BY l_returnflag
        |WITH ERROR 0.2 CONFIDENCE 0.8""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach(r =>
      verifyRow(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(4)))
  }

  test("closed form: HAC strict raises ErrorLimitExceededException (Test4)") {
    gs
    val ex = intercept[Exception] {
      gs.sql(
        """SELECT avg(l_quantity) as T, lower_bound(T) LB, upper_bound(T)
          |FROM li_cb7_s GROUP BY l_returnflag
          |WITH ERROR 0.0000001 CONFIDENCE 0.8 BEHAVIOR 'strict'""".stripMargin)
        .collect()
    }
    def root(t: Throwable): Throwable =
      if (t.getCause == null || t.getCause == t) t else root(t.getCause)
    assert(ex.isInstanceOf[org.apache.spark.sql.graft.ErrorLimitExceededException] ||
      root(ex).isInstanceOf[org.apache.spark.sql.graft.ErrorLimitExceededException] ||
      ex.toString.contains("ErrorLimitExceeded"),
      s"expected ErrorLimitExceededException, got $ex")
  }

  test("closed form: LOCAL_OMIT nulls failing avg/sum cells (Test5)") {
    gs
    val rows = gs.sql(
      """SELECT avg(l_quantity) as A, sum(l_quantity) as S,
        |lower_bound(S) SUMLB, upper_bound(S) SUMUB,
        |relative_error(A) AVGRE, absolute_error(A) AVGAE, l_returnflag
        |FROM li_cb7 GROUP BY l_returnflag
        |WITH ERROR 0.0000001 CONFIDENCE 0.8 BEHAVIOR 'local_omit'""".stripMargin)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.anyNull), "some group must be omitted at this error")
    // omission is per-aggregate-struct: a row with a nulled avg estimate
    // nulls the avg's error columns with it
    rows.filter(_.isNullAt(0)).foreach { r =>
      assert(r.isNullAt(4) && r.isNullAt(5), "omitted avg must null its errors")
    }
    rows.filter(_.isNullAt(1)).foreach { r =>
      assert(r.isNullAt(2) && r.isNullAt(3), "omitted sum must null its bounds")
    }
  }

  test("closed form: LOCAL_OMIT count reports the -1 marker (Test6)") {
    gs
    val rows = gs.sql(
      """SELECT count(l_quantity) as A, relative_error(A) RE,
        |l_returnflag, l_linestatus
        |FROM li_cb7 GROUP BY l_returnflag, l_linestatus
        |WITH ERROR 0.0000001 BEHAVIOR 'local_omit'""".stripMargin).collect()
    assert(rows.nonEmpty)
    // reference closedFormError.scala:162: an omitted COUNT estimate is -1
    // (not NULL — count semantics), its error columns null. Compare via
    // get: the integral converter may surface counts as LONG (SNAP-806)
    val omitted = rows.filter(r => !r.isNullAt(0) && r.get(0) == -1)
    assert(omitted.nonEmpty, "some count group must hit the -1 omit marker")
    omitted.foreach(r => assert(r.isNullAt(1), "omitted count must null RE"))
    // and no row may carry a nulled-out estimate instead of the marker
    assert(rows.forall(r => !r.isNullAt(0)), "count estimate is never NULL")
  }

  // --- bootstrap half ------------------------------------------------------

  /** trial multiplicities under the debug fixed seed: every row shares one
    * SplittableRandom stream, so trial i's multiplicity is the i-th draw */
  private def fixedSeedMultiplicities(seed: Long, trials: Int): Seq[Int] = {
    val rng = new SplittableRandom(seed)
    (1 to trials).map(_ => BootstrapAggregate.poisson1(rng))
  }

  /** the aggregate's quantile math, verbatim (shared FP expressions) */
  private def expectedBounds(values: Seq[Double], confidence: Double): (Double, Double) = {
    val sorted = values.sorted
    val n = sorted.length
    val lowerQ = (1.0 - confidence) / 2.0
    val upperQ = 1.0 - lowerQ
    (sorted(math.min(n - 1, math.floor(n * lowerQ).toInt)),
      sorted(math.max(0, math.ceil(n * upperQ).toInt - 1)))
  }

  private def withBootstrapDebug[A](seed: Long)(body: => A): A = {
    spark.conf.set("spark.sql.aqp.estimator", "bootstrap")
    spark.conf.set("spark.sql.aqp.numBootstrapTrials", "100")
    spark.conf.set("spark.sql.aqp.debug.fixedSeed", seed.toString)
    try body finally {
      spark.conf.unset("spark.sql.aqp.estimator")
      spark.conf.unset("spark.sql.aqp.numBootstrapTrials")
      spark.conf.unset("spark.sql.aqp.debug.fixedSeed")
    }
  }

  test("bootstrap: sum bounds equal the reproduced trial quantiles (Tests A/B)") {
    gs
    withBootstrapDebug(12345L) {
      val r = gs.sql(
        """SELECT sum(l_quantity) as T, lower_bound(T) LB, upper_bound(T) UB,
          |absolute_error(T) AE FROM li_cb7
          |WITH ERROR 0.5 CONFIDENCE 0.9""".stripMargin).collect()(0)
      val (est, lb, ub, ae) =
        (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(est > 0.0)
      val ms = fixedSeedMultiplicities(12345L, 100)
      assume(ms.exists(_ == 0) || ms.exists(_ > 1), "degenerate stream")
      // trial 0 is the unperturbed estimate; zero-multiplicity trials have
      // wcnt = 0 and are excluded from the quantile pool
      val values = 1.0 +: ms.filter(_ > 0).map(_.toDouble)
      val (expLb, expUb) = expectedBounds(values.map(_ * est), 0.9)
      assert(math.abs(lb - expLb) <= 1e-6 * math.abs(est),
        s"LB $lb != reproduced ${expLb}")
      assert(math.abs(ub - expUb) <= 1e-6 * math.abs(est),
        s"UB $ub != reproduced ${expUb}")
      assert(math.abs(ae - (ub - lb) / 2) < 1e-9, "AE must be (UB-LB)/2")
    }
  }

  test("bootstrap: count trials are multiplicity-scaled weighted counts (Test D)") {
    gs
    withBootstrapDebug(777L) {
      val r = gs.sql(
        """SELECT count(l_quantity) as T, lower_bound(T) LB, upper_bound(T) UB
          |FROM li_cb7 WITH ERROR 0.5 CONFIDENCE 0.9""".stripMargin).collect()(0)
      val (est, lb, ub) = (num(r, 0), num(r, 1), num(r, 2))
      assert(est > 0.0)
      val ms = fixedSeedMultiplicities(777L, 100)
      val values = 1.0 +: ms.filter(_ > 0).map(_.toDouble)
      val (expLb, expUb) = expectedBounds(values.map(_ * est), 0.9)
      assert(math.abs(lb - expLb) <= 1e-6 * math.abs(est))
      assert(math.abs(ub - expUb) <= 1e-6 * math.abs(est))
    }
  }

  test("bootstrap: avg trials all equal the estimate under a shared stream (Test C)") {
    gs
    withBootstrapDebug(4242L) {
      val r = gs.sql(
        """SELECT avg(l_quantity) as T, lower_bound(T) LB, upper_bound(T) UB,
          |absolute_error(T) AE FROM li_cb7
          |WITH ERROR 0.5 CONFIDENCE 0.9""".stripMargin).collect()(0)
      val (est, lb, ub, ae) =
        (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      // every trial's ratio (m·Σwx)/(m·Σw) is the estimate: the CI is a point
      assert(math.abs(lb - est) <= 1e-9 * math.abs(est), s"$lb != $est")
      assert(math.abs(ub - est) <= 1e-9 * math.abs(est), s"$ub != $est")
      assert(ae <= 1e-9 * math.abs(est))
    }
  }
}
