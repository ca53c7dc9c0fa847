package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * Accuracy gate at the reference's airline-benchmark profile (reference
 * `AQPPerfTestUtil.scala:36-76`: ~10⁷+ rows, 57 buckets, reservoir 25,
 * small fraction): a synthetic 10⁷-row table with 57 skewed strata
 * (sizes spanning ~100×, like real carrier distributions), sampled at
 * 3%, driven through the SQL surface.
 *
 * Invariants (reference `SamplingAccuracySuite` "AQP-79" and
 * `CommonBugTest` count-consistency):
 *  - weighted count tracks the true count within ±2 globally AND per
 *    stratum (ratio-preserving weights make stratum counts exact);
 *  - closed-form CIs at 95% confidence cover the true per-stratum sum at
 *    roughly the nominal rate (≥ 44 of 57 — binomial slack below the
 *    ~54 expectation, failures indicate broken variance math, not noise);
 *  - the whole gate stays under a minute on the test box.
 */
class AirlineProfileSpec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._

  override def afterAll(): Unit = {
    new GraftSession(TestSpark.spark).dropSampleTable("airprof_s")
    super.afterAll()
  }

  test("10^7-row, 57-stratum profile: count accuracy and CI coverage in <60s") {
    val t0 = System.nanoTime()
    val n = 10_000_000L
    // carrier ~ floor(sqrt(U[0,57^2))) — linearly growing stratum sizes,
    // ~115x between the smallest and largest (airline-like skew).
    // delay: deterministic pseudo-noise with a per-carrier mean shift, so
    // per-stratum sums differ and variance is non-trivial.
    val base = spark.range(n)
      .withColumn("carrier",
        concat(lit("C"), floor(sqrt(pmod(xxhash64(col("id")), lit(3249L))))
          .cast("int"))) // 57 strata: 0..56
      .withColumn("delay",
        (pmod(xxhash64(col("id"), lit(7)), lit(97L)) - lit(20L) +
          length(col("carrier"))).cast("double"))
    base.createOrReplaceTempView("airprof")

    val truth = base.groupBy(col("carrier"))
      .agg(count(lit(1)).as("c"), sum(col("delay")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(truth.size === 57, s"expected 57 strata, got ${truth.size}")
    val sizes = truth.values.map(_._1)
    assert(sizes.max > 50 * sizes.min, "profile must be skewed")

    val gs = new GraftSession(spark)
    gs.sql("CREATE SAMPLE TABLE airprof_s ON airprof " +
      "OPTIONS(qcs 'carrier', fraction '0.03', strataReservoirSize '25')")

    // --- sample count accuracy (reference AQP-79: |base - estimate| < 2) ---
    val est = gs.sql(
      """SELECT carrier, count(*) AS c FROM airprof
        |GROUP BY carrier WITH ERROR""".stripMargin).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.size === 57)
    est.foreach { case (k, c) =>
      assert(math.abs(c - truth(k)._1) < 2, s"stratum $k: $c vs ${truth(k)._1}")
    }
    val globalEst = gs.sql(
      "SELECT count(*) AS c FROM airprof WITH ERROR").collect()(0).getLong(0)
    assert(math.abs(globalEst - n) < 2, s"global $globalEst vs $n")

    // --- closed-form CI coverage for per-stratum sums at 95% -----------------
    val ci = gs.sql(
      """SELECT carrier, sum(delay) AS s, lower_bound(s) AS lb,
        |       upper_bound(s) AS ub, relative_error(s) AS re
        |FROM airprof GROUP BY carrier
        |WITH ERROR 0.9 CONFIDENCE 0.95""".stripMargin).collect()
    assert(ci.length === 57)
    var covered = 0
    ci.foreach { r =>
      val k = r.getString(0)
      val (lb, ub) = (r.getDouble(2), r.getDouble(3))
      assert(lb <= r.getDouble(1) && r.getDouble(1) <= ub, s"estimate outside own CI for $k")
      if (lb <= truth(k)._2 && truth(k)._2 <= ub) covered += 1
      // sampling at 3% with n_s >= ~90 keeps relative error modest
      assert(r.getDouble(4) < 0.5, s"stratum $k relative error ${r.getDouble(4)}")
    }
    assert(covered >= 44,
      s"95% CIs covered only $covered/57 true sums — closed-form variance is off")

    val secs = (System.nanoTime() - t0) / 1e9
    info(f"airline-profile gate completed in $secs%.1f s (coverage $covered/57)")
    assert(secs < 60.0, f"gate took $secs%.1f s (must stay under a minute)")
  }
}
