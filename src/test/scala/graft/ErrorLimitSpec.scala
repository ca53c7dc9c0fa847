package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._
import graft.sampling.StratifiedSampler

class ErrorLimitSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")

  test("error-limit sampler: achieved closed-form error within the limit") {
    val s = StratifiedSampler.sampleWithErrorLimit(li,
      Seq(col("l_returnflag")), col("l_extendedprice"),
      errorLimitPercent = 5.0, confidence = 0.95, reservoirSize = 30)
    // per-stratum achieved relative error of the mean must be ≤ ~limit
    val r = s.groupBy("l_returnflag")
      .agg(approx_avg(col("l_extendedprice"), col(weightColumn)).as("x"))
      .select(relative_error(col("x"))).collect()
    r.foreach(row => assert(row.getDouble(0) <= 0.06,
      s"achieved error ${row.getDouble(0)} over limit"))
  }

  test("error-limit sampler: per-stratum sizes follow the z-sigma formula") {
    val s = StratifiedSampler.sampleWithErrorLimit(li,
      Seq(col("l_returnflag")), col("l_extendedprice"),
      errorLimitPercent = 5.0, confidence = 0.95, reservoirSize = 30)
    val got = s.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val z = org.apache.spark.sql.graft.ClosedFormAggregate.zFactor(0.95)
    val want = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), avg("l_extendedprice").as("mu"),
        stddev_pop("l_extendedprice").as("sigma")).collect()
      .map { r =>
        val (n, mu, sigma) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
        val needed = math.ceil(BigDecimal(
          math.pow(z * sigma / (0.05 * math.abs(mu)), 2))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toLong
        r.getString(0) -> math.min(n, math.max(30L, needed))
      }.toMap
    assert(got === want)
  }

  test("time-series strata: CREATE SAMPLE TABLE with timeSeriesColumn") {
    eventsLongNs(spark).createOrReplaceTempView("events_el")
    val gs = new GraftSession(spark)
    gs.sql("CREATE SAMPLE TABLE ev_sample ON events_el OPTIONS(" +
      "qcs 'event_type', timeSeriesColumn 'ts', timeInterval '86400000', " +
      "timeUnit 'ns', fraction '0.3', strataReservoirSize '5')")
    val sampled = spark.table("ev_sample")
    // strata = (event_type, day): each stratum's kept = max(5, ceil(0.3*n))
    val got = sampled
      .withColumn("day", floor(col("ts") / lit(86400000L * 1000000L)))
      .groupBy("event_type", "day").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = spark.table("events_el")
      .withColumn("day", floor(col("ts") / lit(86400000L * 1000000L)))
      .groupBy("event_type", "day").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        math.min(r.getLong(2), math.max(5L, math.ceil(r.getLong(2) * 0.3).toLong))).toMap
    assert(got === want)
    gs.dropSampleTable("ev_sample")
  }

  test("error functions usable in ORDER BY and HAVING") {
    val gs = new GraftSession(spark)
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li_ob")
    gs.sql("CREATE SAMPLE TABLE li_ob_sample ON li_ob OPTIONS(qcs 'l_returnflag', fraction '0.2')")
    val rows = gs.sql(
      """SELECT l_returnflag, sum(l_quantity) AS s, absolute_error(s) AS e
        |FROM li_ob GROUP BY l_returnflag
        |ORDER BY e DESC
        |WITH ERROR 0.9""".stripMargin).collect()
    assert(rows.length === 3)
    val errs = rows.map(_.getDouble(2))
    assert(errs.sliding(2).forall(p => p(0) >= p(1)))
    gs.dropSampleTable("li_ob_sample")
  }
}
