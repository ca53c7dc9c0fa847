package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * Round-8 tranche of reference regression scenarios from the order_line /
 * NYC-taxi family of `CommonBugTest.scala:1482-2700`: CASE projections over
 * function-QCS group keys under every HAC behavior (AQP-229/239/246/230,
 * AQP-223), HAVING with partial routing (AQP-217), a WITH ERROR subquery
 * registered as a temp view and joined (AQP-231), and DataFrame-API
 * aggregates under `.alias(...)` — the SubqueryAlias the rewrite must see
 * through (SNAP-3236).
 */
class CommonBugs5Spec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._

  private lazy val gs: GraftSession = {
    val g = new GraftSession(spark)
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li_cb5")
    spark.read.parquet(s"$sf/orders.parquet").createOrReplaceTempView("ord_cb5")
    g.sql("CREATE SAMPLE TABLE IF NOT EXISTS li_cb5_mnth ON li_cb5 OPTIONS(" +
      "qcs 'month(l_shipdate)', fraction '0.05', strataReservoirSize '50')")
    g.sql("CREATE SAMPLE TABLE IF NOT EXISTS li_cb5_full ON li_cb5 OPTIONS(" +
      "qcs 'l_returnflag', fraction '1.0')")
    g
  }

  override def afterAll(): Unit = {
    // registered samples match by canonicalized base plan, so without this
    // drop they would leak into every later suite that queries the same
    // lineitem parquet (same pattern as CommonBugs3/4Spec)
    val g = new GraftSession(TestSpark.spark)
    GraftState.of(TestSpark.spark).samples.keys
      .filter(_.startsWith("li_cb5"))
      .toSeq.foreach(g.dropSampleTable)
    super.afterAll()
  }

  private val caseMnt =
    (1 to 12).map(m => s"WHEN month(l_shipdate) = $m THEN '${
      java.time.Month.of(m).getDisplayName(java.time.format.TextStyle.SHORT,
        java.util.Locale.US)}'").mkString("CASE ", " ", " END AS mnt")
  private val validMnt = (1 to 12).map(m => java.time.Month.of(m)
    .getDisplayName(java.time.format.TextStyle.SHORT, java.util.Locale.US)).toSet

  test("AQP-229/239/246/230: CASE over the month group key answers under every behavior") {
    val behaviors = Seq(
      "strict" -> "0.9", "do_nothing" -> "0.0000001",
      "local_omit" -> "0.0000001", "partial_run_on_base_table" -> "0.0000001",
      "run_on_full_table" -> "0.0000001")
    behaviors.foreach { case (b, err) =>
      val rows = gs.sql(
        s"""SELECT sum(l_quantity) AS numOfRides, relative_error(numOfRides), $caseMnt
           |FROM li_cb5 GROUP BY month(l_shipdate) ORDER BY month(l_shipdate)
           |WITH ERROR $err BEHAVIOR '$b'""".stripMargin).collect()
      assert(rows.nonEmpty, s"behavior $b")
      rows.foreach(r => assert(validMnt.contains(r.getString(2)),
        s"behavior $b: bad month label ${r.getString(2)}"))
    }
    // AQP-230 shape: no ORDER BY at all, partial + full routing
    Seq("partial_run_on_base_table", "run_on_full_table").foreach { b =>
      val rows = gs.sql(
        s"""SELECT sum(l_quantity) AS numOfRides, relative_error(numOfRides), $caseMnt
           |FROM li_cb5 GROUP BY month(l_shipdate)
           |WITH ERROR 0.0000001 BEHAVIOR '$b'""".stripMargin).collect()
      assert(rows.nonEmpty, s"behavior $b")
      rows.foreach(r => assert(validMnt.contains(r.getString(2))))
    }
    // AQP-229 tail shape: ordered-limit count with the full error column set
    val rs7 = gs.sql(
      """SELECT count(l_quantity) AS cnt, l_returnflag, absolute_error(cnt),
        |relative_error(cnt), lower_bound(cnt), upper_bound(cnt)
        |FROM li_cb5 WHERE l_quantity > 1 GROUP BY l_returnflag
        |ORDER BY cnt DESC LIMIT 10 WITH ERROR 0.9 BEHAVIOR 'local_omit'""".stripMargin)
      .collect()
    assert(rs7.nonEmpty)
  }

  test("AQP-223: count(*) with a CASE month projection under partial routing") {
    val rows = gs.sql(
      s"""SELECT count(*) AS numOfRides, $caseMnt
         |FROM li_cb5 GROUP BY month(l_shipdate) ORDER BY month(l_shipdate)
         |WITH ERROR 0.1 BEHAVIOR 'partial_run_on_base_table'""".stripMargin).collect()
    assert(rows.nonEmpty && rows.length <= 12)
    rows.foreach(r => assert(validMnt.contains(r.getString(1))))
  }

  test("AQP-217: HAVING + full error set under do_nothing and partial routing agree at fraction 1") {
    def q(b: String, agg: String, having: String) = gs.sql(
      s"""SELECT l_returnflag, $agg(l_quantity) AS a, absolute_error(a),
         |relative_error(a), lower_bound(a), upper_bound(a)
         |FROM li_cb5 GROUP BY l_returnflag HAVING $having
         |ORDER BY a DESC WITH ERROR 0.005 BEHAVIOR '$b'""".stripMargin)
      .collect().map(r => (r.getString(0),
        BigDecimal(r.getDouble(1)).setScale(4, BigDecimal.RoundingMode.HALF_UP)))
    val exactSum = spark.sql(
      """SELECT l_returnflag, sum(l_quantity) AS a FROM li_cb5
        |GROUP BY l_returnflag HAVING sum(l_quantity) > 1000 ORDER BY a DESC""".stripMargin)
      .collect().map(r => (r.getString(0),
        BigDecimal(r.getDouble(1)).setScale(4, BigDecimal.RoundingMode.HALF_UP)))
    val dn = q("do_nothing", "sum", "sum(l_quantity) > 1000")
    val pr = q("partial_run_on_base_table", "sum", "sum(l_quantity) > 1000")
    assert(dn.toSeq === exactSum.toSeq)
    assert(pr.toSeq === exactSum.toSeq)
    // the avg variants of the reference test (HAVING avg(...) < bound)
    val dnA = q("do_nothing", "avg", "avg(l_quantity) < 300")
    val prA = q("partial_run_on_base_table", "avg", "avg(l_quantity) < 300")
    assert(dnA.toSeq === prA.toSeq && dnA.nonEmpty)
  }

  test("AQP-231: WITH ERROR subquery as a temp view, joined and re-aggregated") {
    // dedicated view + full-fraction orderkey-QCS sample so the subquery's
    // routing is deterministic and its estimates exact
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li_cb5b")
    gs.sql("CREATE SAMPLE TABLE IF NOT EXISTS li_cb5b_ok ON li_cb5b OPTIONS(" +
      "qcs 'l_orderkey', fraction '1.0')")
    val aqpSub = gs.sql(
      """SELECT l_orderkey, sum(l_quantity) AS daily_trips
        |FROM li_cb5b WHERE l_quantity > 5 GROUP BY l_orderkey
        |ORDER BY daily_trips DESC WITH ERROR""".stripMargin)
    aqpSub.createOrReplaceTempView("aqp_temptrips_cb5")
    val got = spark.sql(
      """SELECT o.o_orderpriority, round(sum(o.o_totalprice), 2) AS income
        |FROM aqp_temptrips_cb5 t JOIN ord_cb5 o ON t.l_orderkey = o.o_orderkey
        |WHERE t.daily_trips > 10 GROUP BY o.o_orderpriority
        |ORDER BY income DESC""".stripMargin).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val want = spark.sql(
      """WITH trips AS (
        |  SELECT l_orderkey, sum(l_quantity) AS daily_trips
        |  FROM li_cb5b WHERE l_quantity > 5 GROUP BY l_orderkey)
        |SELECT o.o_orderpriority, round(sum(o.o_totalprice), 2) AS income
        |FROM trips t JOIN ord_cb5 o ON t.l_orderkey = o.o_orderkey
        |WHERE t.daily_trips > 10 GROUP BY o.o_orderpriority
        |ORDER BY income DESC""".stripMargin).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    // full-fraction orderkey-QCS sample ⇒ exact equality
    assert(got.toSeq === want.toSeq)
  }

  test("SNAP-3236: DataFrame aggregate under .alias plans through partial and full routing") {
    val base = spark.table("li_cb5")
    Seq("partial_run_on_base_table", "run_on_full_table").foreach { b =>
      val df = base.groupBy("l_returnflag", "l_shipdate")
        .agg(Map("l_quantity" -> "sum")).alias("total_tips")
        .sort(col("sum(l_quantity)").desc)
        .limit(10)
      val rows = gs.withError(df, error = 0.01, behavior = b).collect()
      assert(rows.length == 10, s"behavior $b")
      // limit-10 of a sum-desc sort: values must be non-increasing
      val vals = rows.map(_.getDouble(2))
      assert(vals.zip(vals.tail).forall { case (a, c) => a >= c }, s"behavior $b")
    }
  }
}
