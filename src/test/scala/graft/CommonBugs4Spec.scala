package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * Fourth tranche of reference regression scenarios (the `CommonBugTest`
 * order_line / NYC-taxi family, `CommonBugTest.scala:848-2319`), ported as
 * engine invariants over the synthetic tables:
 *
 *  - "Bug AQP224 ... AQP-247" rs2 and "Bug AQP225: Join of two subquery":
 *    a join of TWO independently aggregated subqueries, EACH over its own
 *    sample table with its own error functions — two AQP rewrites in one
 *    statement (the two-sample rejection applies only to a join UNDER one
 *    aggregate, never to completed per-subquery estimates);
 *  - "Test repeat aggregates": duplicate aliased aggregates must resolve to
 *    one shared estimate (avg1 = avg2 = avg3), with error functions and
 *    HAVING on any alias;
 *  - "Bug NPE in getting sample_count": count over a sample whose QCS
 *    column holds NULLs;
 *  - "Bug AQP-210 and AQP-227": arithmetic OVER error functions in HAVING —
 *    `(-1)*(lower_bound+upper_bound) > 0` must select exactly the
 *    negative-sum groups — and an IN-subquery whose inner HAVING empties
 *    the result: both routes answer empty, no throw;
 *  - "Bug AQP-154/204/205/94/207": repeated identical statements answer
 *    identically (incl. ORDER BY agg DESC LIMIT), and the estimated
 *    count(*) from a fraction sample tracks the exact count;
 *  - AQP-214: when the group expression IS the QCS, per-group count
 *    estimates are exact (every stratum fully represented in the weights).
 */
class CommonBugs4Spec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._

  private lazy val gs: GraftSession = {
    val g = new GraftSession(spark)
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li_cb4")
    spark.read.parquet(s"$sf/orders.parquet").createOrReplaceTempView("ord_cb4")
    g.sql("CREATE SAMPLE TABLE li_cb4_s ON li_cb4 " +
      "OPTIONS(qcs 'l_returnflag', fraction '0.3')")
    g.sql("CREATE SAMPLE TABLE ord_cb4_s ON ord_cb4 " +
      "OPTIONS(qcs 'o_orderpriority', fraction '0.3')")
    g
  }

  override def afterAll(): Unit = {
    val g = new GraftSession(TestSpark.spark)
    GraftState.of(TestSpark.spark).samples.keys
      .filter(n => n.startsWith("li_cb4") || n.startsWith("ord_cb4") ||
        n.startsWith("nullq_cb4"))
      .toSeq.foreach(g.dropSampleTable)
    super.afterAll()
  }

  // --- AQP-225 / AQP-247 rs2: two samples, two subqueries, one join --------
  test("AQP-225/247: join of two subqueries each estimating from its own sample") {
    val df = gs.sql(
      """SELECT t.rf, t.qty, t.ae, e.revenue, e.ae2
        |FROM (SELECT l_returnflag AS rf, sum(l_quantity) AS qty,
        |             absolute_error(qty) AS ae
        |      FROM li_cb4 GROUP BY 1 ORDER BY qty DESC LIMIT 10
        |      WITH ERROR 0.9) t
        |JOIN (SELECT substr(o_orderpriority, 1, 1) AS pr,
        |             sum(o_totalprice) AS revenue,
        |             absolute_error(revenue) AS ae2
        |      FROM ord_cb4 GROUP BY 1 ORDER BY revenue DESC LIMIT 10
        |      WITH ERROR 0.9) e
        |  ON length(t.rf) = length(e.pr)
        |ORDER BY t.rf, e.revenue DESC""".stripMargin)
    // BOTH subqueries must ride their samples: the weight column appears
    // under each side of the join in the analyzed plan
    val analyzed = df.queryExecution.analyzed
    val joinNode = analyzed.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.get
    val w = org.apache.spark.sql.graft.Weightage.WeightColumn
    assert(joinNode.left.treeString.contains(w),
      "left subquery must estimate from its sample")
    assert(joinNode.right.treeString.contains(w),
      "right subquery must estimate from its sample")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // error functions from both rewrites are live (non-negative doubles)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(4) >= 0.0)
    }
  }

  // --- "Test repeat aggregates" --------------------------------------------
  test("repeat aggregates: duplicate aliases share one estimate, HAVING on any alias") {
    for ((agg, cast) <- Seq("avg(l_quantity)" -> "double",
      "sum(l_quantity)" -> "double", "count(*)" -> "long")) {
      val rows = gs.sql(
        s"""SELECT l_returnflag, $agg AS a1, $agg AS a2, $agg AS a3,
           |       absolute_error(a1) AS ae
           |FROM li_cb4_s GROUP BY l_returnflag BEHAVIOR 'do_nothing'"""
          .stripMargin).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.get(1) === r.get(2), s"$agg: a1 != a2")
        assert(r.get(2) === r.get(3), s"$agg: a2 != a3")
        assert(r.getDouble(4) >= 0.0)
      }
    }
    // HAVING on the repeated aggregate filters by the shared estimate. The
    // baseline projects the SAME shape (incl. the error function) as the
    // filtered query: a plain avg takes the bypass path whose floating-point
    // summation structure differs from the closed-form aggregate's at the
    // last ulp (pinned ≤ 1e-9 agreement, not bit equality), and the cut sits
    // exactly on a group's estimate
    val all = gs.sql(
      """SELECT l_returnflag, avg(l_quantity) AS a1, avg(l_quantity) AS a2,
        |       absolute_error(a1) AS ae
        |FROM li_cb4_s GROUP BY l_returnflag BEHAVIOR 'do_nothing'"""
        .stripMargin).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val cut = all.values.toSeq.sorted.apply(all.size / 2)
    val kept = gs.sql(
      s"""SELECT l_returnflag, avg(l_quantity) AS a1, avg(l_quantity) AS a2,
         |       absolute_error(a1) AS ae
         |FROM li_cb4_s GROUP BY l_returnflag
         |HAVING avg(l_quantity) > $cut BEHAVIOR 'do_nothing'"""
        .stripMargin).collect()
    assert(kept.length === all.count(_._2 > cut))
    kept.foreach { r =>
      assert(r.getDouble(1) === all(r.getString(0)))
      assert(r.getDouble(1) === r.getDouble(2))
      assert(r.getDouble(1) > cut)
    }
  }

  // --- "Bug NPE in getting sample_count" -----------------------------------
  test("count over a sample whose QCS column holds NULLs") {
    import spark.implicits._
    Seq[(java.lang.Integer, Double)]((1, 1.0), (2, 2.0), (null, 3.0),
      (null, 4.0), (1, 5.0), (2, 6.0), (null, 7.0))
      .toDF("olnum", "amount").createOrReplaceTempView("nullq_cb4")
    gs.sql("CREATE SAMPLE TABLE nullq_cb4_s ON nullq_cb4 " +
      "OPTIONS(qcs 'olnum', fraction '0.5', strataReservoirSize '2')")
    // direct count on the sample: plain long, no NPE, > 0
    val cnt = gs.sql("SELECT count(*) AS sample_cnt FROM nullq_cb4_s")
      .collect()(0).getLong(0)
    assert(cnt > 0)
    // the NULL stratum is a real stratum: estimated total matches exact
    val est = gs.sql(
      """SELECT count(*) AS c, absolute_error(c) AS ae
        |FROM nullq_cb4 WITH ERROR 0.95""".stripMargin).collect()(0)
    assert(est.getLong(0) === 7L,
      s"closed-form count over full strata must be exact, got ${est.getLong(0)}")
  }

  // --- AQP-210 rs5: negated compound error-function HAVING -----------------
  test("AQP-210: HAVING (-1)*(lower_bound+upper_bound) > 0 selects the negative groups") {
    // l_discount - 0.05 gives groups with positive and negative sums
    def q(having: String) = gs.sql(
      s"""SELECT l_returnflag, sum(l_discount - 0.05) AS x,
         |       lower_bound(x) AS lb, upper_bound(x) AS ub,
         |       lower_bound(x) + upper_bound(x) AS lbub
         |FROM li_cb4 GROUP BY l_returnflag $having
         |ORDER BY l_returnflag WITH ERROR 0.9 CONFIDENCE 0.95
         |BEHAVIOR 'do_nothing'""".stripMargin).collect()
    val all = q("")
    assert(all.nonEmpty)
    all.foreach { r =>
      assert(math.abs((r.getDouble(2) + r.getDouble(3)) - r.getDouble(4)) < 1e-9,
        "projected lb+ub must equal the sum of the projected bounds")
    }
    val negatives = all.filter(_.getDouble(4) < 0)
    val selected = q("HAVING (-1)*(lower_bound(x) + upper_bound(x)) > 0")
    assert(selected.length === negatives.length,
      s"negated compound HAVING selected ${selected.length} of " +
        s"${negatives.length} negative groups")
    selected.zip(negatives).foreach { case (s, n) =>
      assert(s.getString(0) === n.getString(0))
      assert(s.getDouble(1) === n.getDouble(1))
      assert(s.getDouble(4) === n.getDouble(4) && s.getDouble(4) < 0)
    }
  }

  // --- AQP-227: IN-subquery emptied by its inner HAVING --------------------
  test("AQP-227: IN-subquery with impossible inner HAVING answers empty, no throw") {
    def q(withError: String) = gs.sql(
      s"""SELECT avg(l_quantity + l_discount) AS a, count(*) AS n,
         |       l_returnflag, avg(l_extendedprice) AS p
         |       ${if (withError.nonEmpty) ", absolute_error(p)" else ""}
         |FROM li_cb4
         |WHERE (l_quantity > 60 OR l_discount > 60)
         |  AND l_returnflag IN (SELECT l_returnflag FROM li_cb4
         |                       GROUP BY l_returnflag
         |                       HAVING count(*) > 1000000000)
         |GROUP BY l_returnflag ORDER BY a DESC $withError""".stripMargin)
      .collect()
    val approx = q("WITH ERROR 0.9")
    val exact = q("")
    assert(approx.isEmpty && exact.isEmpty,
      "both routes must answer empty when the IN-subquery empties")
  }

  // --- AQP-204: repeated identical statements answer identically -----------
  test("AQP-204: repeated identical ORDER BY agg DESC LIMIT statements reproduce") {
    def run() = gs.sql(
      """SELECT avg(l_extendedprice) AS avgp, l_returnflag,
        |       sum(l_extendedprice) AS total, count(*) AS cnt,
        |       absolute_error(cnt) AS ae
        |FROM li_cb4 WHERE l_quantity >= 0 OR l_quantity <= 0
        |GROUP BY l_returnflag ORDER BY avgp DESC LIMIT 10
        |WITH ERROR 0.9""".stripMargin).collect()
      .map(r => (r.getDouble(0), r.getString(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4))).toSeq
    val a = run(); val b = run(); val c = run()
    assert(a.nonEmpty)
    assert(a === b && b === c,
      "identical statements must answer identically run over run")
  }

  // --- AQP-154/204 count-tracking + AQP-214 exact QCS-group counts ---------
  test("AQP-214: count estimates are exact when the group expression is the QCS") {
    // sample stratified on the same expression the query groups by: every
    // stratum's weights sum to its exact total
    val est = gs.sql(
      """SELECT l_returnflag, count(*) AS c, absolute_error(c) AS ae
        |FROM li_cb4 GROUP BY l_returnflag WITH ERROR 0.95"""
        .stripMargin).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = spark.table("li_cb4").groupBy(col("l_returnflag")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    est.foreach { case (k, v) =>
      assert(math.abs(v - exact(k)) <= 2,
        s"stratum $k: estimated $v vs exact ${exact(k)}")
    }
    // ungrouped count estimate tracks the exact total (AQP-204's < 3)
    val tot = gs.sql(
      "SELECT count(*) AS c, absolute_error(c) FROM li_cb4 WITH ERROR 0.95")
      .collect()(0).getLong(0)
    val exactTot = spark.table("li_cb4").count()
    assert(math.abs(tot - exactTot) <= 3,
      s"estimated total $tot vs exact $exactTot")
  }
}
