package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * Error-introspection function coverage mirroring the reference's
 * `ErrorEstimateFunctionTest` shapes: binding across multiple aggregates,
 * arithmetic over error functions, bound ordering per aggregate kind,
 * compound-aggregate aliases, the relative-error clamp near zero, and
 * bootstrap-estimator usage in HAVING / ORDER BY.
 */
class ErrorFunctionSpec extends AnyFunSuite with BeforeAndAfterAll {

  override def afterAll(): Unit = {
    // suites share one session: a leaked sample on a plan-equal base would
    // hijack other suites' queries (sample pooling is by plan equality)
    GraftState.of(TestSpark.spark).samples.keys
      .filter(_.startsWith("li_ef")).toSeq
      .foreach(new GraftSession(TestSpark.spark).dropSampleTable)
    super.afterAll()
  }
  import TestSpark._

  private lazy val gs: GraftSession = {
    val g = new GraftSession(spark)
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li_ef")
    g.sql("CREATE SAMPLE TABLE li_ef_s ON li_ef OPTIONS(qcs 'l_returnflag', fraction '0.2')")
    g
  }

  test("AQP-210/227: arithmetic over MULTIPLE error functions, in SELECT and HAVING") {
    // reference CommonBugTest: `lower_bound(x) + upper_bound(x)` projected
    // alongside the individual bounds must equal their sum per row; the
    // same compound (even sign-flipped) works as a HAVING predicate
    gs
    val rows = gs.sql(
      """SELECT l_returnflag, sum(l_quantity) AS x,
        |       lower_bound(x) AS lb, upper_bound(x) AS ub,
        |       lower_bound(x) + upper_bound(x) AS lbub,
        |       relative_error(x) + absolute_error(x) AS rae,
        |       relative_error(x) AS re, absolute_error(x) AS ae
        |FROM li_ef GROUP BY 1 ORDER BY 1 WITH ERROR 0.9""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) + r.getDouble(3) === r.getDouble(4),
        s"${r.getString(0)}: lb+ub compound mismatch")
      assert(r.getDouble(6) + r.getDouble(7) === r.getDouble(5),
        s"${r.getString(0)}: re+ae compound mismatch")
    }
    // HAVING over the compound: all groups have positive sums here, so the
    // plain predicate keeps every group and the sign-flipped one drops all
    val kept = gs.sql(
      """SELECT l_returnflag, sum(l_quantity) AS x,
        |       lower_bound(x) + upper_bound(x) AS lbub
        |FROM li_ef GROUP BY 1
        |HAVING lower_bound(x) + upper_bound(x) > 0 WITH ERROR 0.9""".stripMargin)
      .collect()
    assert(kept.length === rows.length)
    kept.foreach(r => assert(r.getDouble(2) > 0))
    val dropped = gs.sql(
      """SELECT l_returnflag, sum(l_quantity) AS x
        |FROM li_ef GROUP BY 1
        |HAVING (-1) * (lower_bound(x) + upper_bound(x)) > 0
        |WITH ERROR 0.9""".stripMargin).collect()
    assert(dropped.isEmpty)
  }

  test("each error function binds to its own aggregate") {
    gs // init
    val rows = gs.sql(
      """SELECT l_returnflag,
        |       sum(l_extendedprice) AS big, absolute_error(big) AS ae_big,
        |       sum(l_discount) AS small, absolute_error(small) AS ae_small
        |FROM li_ef GROUP BY l_returnflag WITH ERROR 0.9""".stripMargin).collect()
    rows.foreach { r =>
      val (big, aeBig, small, aeSmall) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      // l_extendedprice sums are ~6 orders of magnitude above l_discount
      // sums; if both stubs bound to one aggregate the errors would match
      assert(aeBig > aeSmall * 100,
        s"binding mixed up: ae(big=$big)=$aeBig vs ae(small=$small)=$aeSmall")
      assert(aeBig > 0 && aeSmall > 0)
    }
  }

  test("error functions compose with arithmetic and rounding") {
    val rows = gs.sql(
      """SELECT l_returnflag, sum(l_quantity) AS s,
        |       round(absolute_error(s) * 2, 4) AS double_ae,
        |       absolute_error(s) AS ae
        |FROM li_ef GROUP BY l_returnflag WITH ERROR 0.9""".stripMargin).collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2) - BigDecimal(r.getDouble(3) * 2)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("bound ordering holds for sum, avg and count aggregates") {
    val rows = gs.sql(
      """SELECT l_returnflag,
        |       sum(l_quantity) AS s, lower_bound(s) AS slb, upper_bound(s) AS sub,
        |       avg(l_extendedprice) AS a, lower_bound(a) AS alb, upper_bound(a) AS aub,
        |       count(*) AS c, lower_bound(c) AS clb, upper_bound(c) AS cub
        |FROM li_ef GROUP BY l_returnflag WITH ERROR 0.9""".stripMargin).collect()
    rows.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(1) && r.getDouble(1) <= r.getDouble(3))
      assert(r.getDouble(5) <= r.getDouble(4) && r.getDouble(4) <= r.getDouble(6))
      // the count point estimate is rounded to LongType while the bounds
      // stay double — allow rounding slack of half a row
      assert(r.getDouble(8) <= r.getLong(7) + 0.5 &&
        r.getLong(7) - 0.5 <= r.getDouble(9))
    }
  }

  test("error function on a compound aggregate expression") {
    val rows = gs.sql(
      """SELECT l_returnflag,
        |       sum(l_extendedprice * (1 - l_discount)) AS rev,
        |       absolute_error(rev) AS ae, relative_error(rev) AS re
        |FROM li_ef GROUP BY l_returnflag WITH ERROR 0.9""".stripMargin).collect()
    rows.foreach { r =>
      assert(r.getDouble(2) > 0 && r.getDouble(3) > 0)
      assert(math.abs(r.getDouble(2) / r.getDouble(1) - r.getDouble(3)) < 1e-6,
        "relative error must equal abs/|estimate| for large estimates")
    }
  }

  test("relative-error clamp: near-zero estimates stay finite") {
    // sum(l_discount - l_discount) ≡ 0 per group — the clamp divides by
    // |est|+1 when |est| ≤ 1 (reference closedFormError.scala:142-158)
    val rows = gs.sql(
      """SELECT l_returnflag, sum(l_discount - l_discount) AS z,
        |       relative_error(z) AS re
        |FROM li_ef GROUP BY l_returnflag WITH ERROR 0.9""".stripMargin).collect()
    rows.foreach { r =>
      assert(r.getDouble(1) === 0.0)
      assert(java.lang.Double.isFinite(r.getDouble(2)), "clamp must prevent /0")
      assert(r.getDouble(2) >= 0.0)
    }
  }

  test("bootstrap estimator: error functions usable in HAVING and ORDER BY") {
    spark.conf.set("spark.sql.aqp.estimator", "bootstrap")
    try {
      val rows = gs.sql(
        """SELECT l_returnflag, sum(l_quantity) AS s,
          |       relative_error(s) AS re
          |FROM li_ef GROUP BY l_returnflag
          |HAVING relative_error(s) < 1.0
          |ORDER BY absolute_error(s) DESC, l_returnflag
          |WITH ERROR 0.9""".stripMargin).collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getDouble(2) < 1.0))
    } finally spark.conf.set("spark.sql.aqp.estimator", "closedform")
  }

  test("bare WITH ERROR picks up session defaults") {
    spark.conf.set("spark.sql.aqp.error", "0.8")
    try {
      val rows = gs.sql(
        """SELECT l_returnflag, sum(l_quantity) AS s, absolute_error(s) AS ae
          |FROM li_ef GROUP BY l_returnflag WITH ERROR""".stripMargin).collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getDouble(2) > 0.0))
    } finally spark.conf.unset("spark.sql.aqp.error")
  }
}
