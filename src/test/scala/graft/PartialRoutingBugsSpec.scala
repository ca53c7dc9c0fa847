package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * Fourth reference-scenario tranche: the `PartialQueryRoutingTestSuite` /
 * `JoinQueryRoutingTestSuite` shapes not yet in `RoutingMatrixSpec` —
 * partial routing with error functions and mixed select lists (AQP-201,
 * ENT-60 incl. show-vs-collect parity), WHERE on the group-by column under
 * partial behavior, the bootstrap global-aggregate partial, and the
 * non-aggregate join-routing family (two samples, sample+base, semi join
 * with an error clause): row-returning queries never sample.
 */
class PartialRoutingBugsSpec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._

  private lazy val gs: GraftSession = {
    val g = new GraftSession(spark)
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li_pr")
    spark.read.parquet(s"$sf/orders.parquet").createOrReplaceTempView("ord_pr")
    g.sql("CREATE SAMPLE TABLE li_pr_s ON li_pr " +
      "OPTIONS(qcs 'l_returnflag', fraction '0.2')")
    g.sql("CREATE SAMPLE TABLE ord_pr_s ON ord_pr " +
      "OPTIONS(qcs 'o_orderpriority', fraction '0.2')")
    g
  }

  override def afterAll(): Unit = {
    val g = new GraftSession(TestSpark.spark)
    GraftState.of(TestSpark.spark).samples.keys
      .filter(n => n.startsWith("li_pr") || n.startsWith("ord_pr"))
      .toSeq.foreach(g.dropSampleTable)
    super.afterAll()
  }

  // --- PartialQueryRoutingTestSuite "Bug AQP-201 order by" ------------------
  test("AQP-201: partial routing with error functions and ORDER BY the group column") {
    gs
    val exact = spark.sql(
      "SELECT l_returnflag, round(sum(l_extendedprice), 2) AS s " +
        "FROM li_pr GROUP BY l_returnflag ORDER BY l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val rows = gs.sql(
      """SELECT l_returnflag, round(sum(l_extendedprice), 2) AS s,
        |       lower_bound(s) AS lb, upper_bound(s) AS ub,
        |       relative_error(s) AS re, absolute_error(s) AS ae
        |FROM li_pr GROUP BY l_returnflag ORDER BY l_returnflag
        |WITH ERROR 0.0000001 CONFIDENCE 0.95
        |BEHAVIOR 'partial_run_on_base_table'""".stripMargin).collect()
    assert(rows.length === exact.length, "every group must be present")
    rows.zip(exact).foreach { case (g, (flag, s)) =>
      assert(g.getString(0) === flag)
      // the impossible error budget reroutes every group: exact values,
      // zero errors on the rerouted (exact) rows
      assert(g.getDouble(1) === s, s"group $flag must be exact after reroute")
      assert(g.getDouble(4) === 0.0 && g.getDouble(5) === 0.0,
        s"rerouted group $flag must report zero errors")
    }
  }

  // --- PartialQueryRoutingTestSuite "Bug ENT-60" ----------------------------
  test("ENT-60: partial routing with max + bounds + WHERE, show/take agrees with collect") {
    gs
    val df = gs.sql(
      """SELECT round(sum(l_quantity), 4) AS s, lower_bound(s) AS lb,
        |       upper_bound(s) AS ub, relative_error(s) AS re,
        |       absolute_error(s) AS ae, l_returnflag, max(l_quantity) AS mx
        |FROM li_pr WHERE l_orderkey > 3
        |GROUP BY l_returnflag ORDER BY s DESC
        |WITH ERROR 0.2 CONFIDENCE 0.95
        |BEHAVIOR 'partial_run_on_base_table'""".stripMargin)
    val collected = df.collect()
    // the ENT-60 bug: show()/take() disagreed with collect() on the same
    // DataFrame — re-executing through take must reproduce the same rows
    val taken = df.take(5)
    collected.take(5).zip(taken).foreach { case (c, t) =>
      assert(c.getDouble(0) === t.getDouble(0) &&
        c.getString(5) === t.getString(5) &&
        c.getDouble(6) === t.getDouble(6),
        "take() must agree with collect() on a partial-routed query")
    }
    // max rides along exactly (it is computed over sample rows of the
    // passing groups and exact rows of the rerouted ones; with the whole
    // where-filtered base present in every stratum the exact max matches)
    val exactMax = spark.sql(
      "SELECT l_returnflag, max(l_quantity) FROM li_pr WHERE l_orderkey > 3 " +
        "GROUP BY l_returnflag").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    collected.foreach { r =>
      assert(r.getDouble(6) <= exactMax(r.getString(5)),
        "sampled max can never exceed the exact max")
    }
  }

  // --- PartialQueryRoutingTestSuite "test where clause on same column as
  // group by closedform" -----------------------------------------------------
  test("WHERE on the group-by column under partial routing: filtered groups exact on reroute") {
    gs
    val exact = spark.sql(
      "SELECT l_returnflag, round(sum(l_quantity), 4) AS s FROM li_pr " +
        "WHERE l_returnflag <> 'N' GROUP BY l_returnflag ORDER BY l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val rows = gs.sql(
      """SELECT l_returnflag, round(sum(l_quantity), 4) AS s,
        |       absolute_error(s) AS ae
        |FROM li_pr WHERE l_returnflag <> 'N'
        |GROUP BY l_returnflag ORDER BY l_returnflag
        |WITH ERROR 0.0000001 BEHAVIOR 'partial_run_on_base_table'""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.toSeq === exact.toSeq,
      "filter on the stratification column + impossible budget must " +
        "reroute the filtered groups exactly (never resurrect 'N')")
  }

  // --- PartialQueryRoutingTestSuite "test without group by bootstrap" -------
  test("global aggregate partial routing under bootstrap reroutes exactly") {
    gs
    spark.conf.set("spark.sql.aqp.estimator", "bootstrap")
    spark.conf.set("spark.sql.aqp.fixedSeed", "true")
    try {
      val exact = spark.sql("SELECT round(sum(l_quantity), 4) FROM li_pr")
        .collect()(0).getDouble(0)
      val r = gs.sql(
        """SELECT round(sum(l_quantity), 4) AS s, absolute_error(s) AS ae
          |FROM li_pr WITH ERROR 0.0000001 CONFIDENCE 0.95
          |BEHAVIOR 'partial_run_on_base_table'""".stripMargin).collect()(0)
      assert(r.getDouble(0) === exact,
        "the impossible budget must reroute the single global group exactly")
      assert(r.getDouble(1) === 0.0)
    } finally {
      spark.conf.set("spark.sql.aqp.estimator", "closedform")
      spark.conf.unset("spark.sql.aqp.fixedSeed")
    }
  }

  // --- JoinQueryRoutingTestSuite "test join of two sample tables without
  // aggregate" ---------------------------------------------------------------
  test("non-aggregate join of two sampled bases returns exact base rows") {
    gs
    val exact = spark.sql(
      "SELECT l_orderkey FROM li_pr JOIN ord_pr ON l_orderkey = o_orderkey " +
        "WHERE o_totalprice > 100000 ORDER BY l_orderkey").collect().length
    val got = gs.sql(
      "SELECT l_orderkey FROM li_pr JOIN ord_pr ON l_orderkey = o_orderkey " +
        "WHERE o_totalprice > 100000 ORDER BY l_orderkey " +
        "WITH ERROR 0.95 CONFIDENCE 0.95").collect().length
    assert(got === exact,
      "a row-returning join over two sampled bases must not be sampled")
  }

  // --- JoinQueryRoutingTestSuite "test join of one sample table with
  // another base table without aggregate" ------------------------------------
  test("non-aggregate join naming a SAMPLE TABLE returns the sample's rows exactly") {
    gs
    val exact = spark.table("li_pr_s")
      .join(spark.table("ord_pr"), col("l_orderkey") === col("o_orderkey"))
      .count()
    val got = gs.sql(
      "SELECT li_pr_s.l_orderkey FROM li_pr_s JOIN ord_pr " +
        "ON l_orderkey = o_orderkey WITH ERROR 0.95").collect().length
    assert(got.toLong === exact,
      "a row-returning join naming the sample reads the sample as a table")
  }

  // --- CommonBugTest "Bug AQP223: CASE Statement with different HAC
  // behavior": the projected column is a CASE over the GROUP expression
  // (not the group expression itself) above the partial-routing union -----
  test("AQP223: CASE over the group expression under partial routing") {
    gs
    val core =
      """SELECT count(*) AS n,
        |       CASE WHEN l_returnflag = 'A' THEN 'Accept'
        |            WHEN l_returnflag = 'N' THEN 'None'
        |            ELSE 'Return' END AS flag
        |FROM li_pr GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    val exact = spark.sql(core).collect().map(r => (r.getLong(0), r.getString(1)))
    // impossible budget: every group reroutes → exact parity through the
    // CASE projection and the re-sort above the partial union
    val rerouted = gs.sql(core +
      " WITH ERROR 0.0000001 BEHAVIOR 'partial_run_on_base_table'")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rerouted.toSeq === exact.toSeq)
    // loose budget: same groups, sampled counts near exact
    val loose = gs.sql(core +
      " WITH ERROR 0.5 BEHAVIOR 'partial_run_on_base_table'").collect()
    assert(loose.map(_.getString(1)).toSeq === exact.map(_._2).toSeq,
      "CASE labels must survive the partial union in group order")
  }

  // --- CommonBugTest "Bug AQP217: Having clause with partial routing":
  // HAVING on the bare aggregate + ORDER BY the aggregate DESC + the full
  // error-function spread, under do_nothing AND partial routing ----------
  test("AQP217: HAVING + ORDER BY agg DESC + all error functions under partial routing") {
    gs
    def run(agg: String, having: String, behavior: String) = gs.sql(
      s"""SELECT l_returnflag, $agg AS v, absolute_error(v) AS ae,
         |       relative_error(v) AS re, lower_bound(v) AS lb,
         |       upper_bound(v) AS ub
         |FROM li_pr WHERE l_orderkey > 10
         |GROUP BY l_returnflag HAVING $having
         |ORDER BY v DESC
         |WITH ERROR 0.005 BEHAVIOR '$behavior'""".stripMargin).collect()
    // do_nothing: runs, ordered desc by the estimate, errors present
    val dn = run("sum(l_quantity)", "sum(l_quantity) > 1000", "do_nothing")
    assert(dn.nonEmpty)
    assert(dn.map(_.getDouble(1)).toSeq ===
      dn.map(_.getDouble(1)).sortBy(-(_: Double)).toSeq, "DESC order holds")
    // partial routing with a near-impossible budget: failing groups re-run
    // exactly, and the HAVING applies to the final (exact) values
    val exact = spark.sql(
      "SELECT l_returnflag, sum(l_quantity) AS v FROM li_pr " +
        "WHERE l_orderkey > 10 GROUP BY l_returnflag HAVING sum(l_quantity) > 1000 " +
        "ORDER BY v DESC").collect().map(r => (r.getString(0), r.getDouble(1)))
    val pr = run("sum(l_quantity)", "sum(l_quantity) > 1000",
      "partial_run_on_base_table")
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(pr.toSeq === exact.toSeq,
      "near-impossible budget: partial routing must converge to the exact " +
        "HAVING-filtered, DESC-ordered result")
    // avg variant (the AQP217 query family)
    val avgRows = run("avg(l_quantity)", "avg(l_quantity) > 2",
      "partial_run_on_base_table")
    assert(avgRows.nonEmpty)
  }

  // --- JoinQueryTest "test correctness of sum formula for closedform error
  // estimate of join query": a row-preserving dim join (every fact row
  // matches exactly one dim row) must not perturb the estimate OR the error
  // formula relative to the same query without the join -------------------
  test("row-preserving dim join leaves estimate and error formula unchanged") {
    gs
    spark.sql("SELECT DISTINCT l_returnflag AS rf, " +
      "concat('label_', l_returnflag) AS label FROM li_pr")
      .createOrReplaceTempView("flagdim_pr")
    def run(from: String, where: String) = gs.sql(
      s"""SELECT round(sum(l_quantity), 4) AS x, absolute_error(x) AS ae,
         |       relative_error(x) AS re
         |FROM $from $where WITH ERROR 0.9 CONFIDENCE 0.95""".stripMargin)
      .collect()(0)
    val joined = run("li_pr, flagdim_pr", "WHERE rf = l_returnflag")
    val plain = run("li_pr", "")
    assert(joined.getDouble(0) === plain.getDouble(0),
      "1:1 dim join must not change the weighted estimate")
    assert(math.abs(joined.getDouble(1) - plain.getDouble(1)) <=
      math.abs(plain.getDouble(1)) * 1e-6 + 1e-9,
      "1:1 dim join must not change the absolute error")
    assert(math.abs(joined.getDouble(2) - plain.getDouble(2)) <= 1e-9,
      "1:1 dim join must not change the relative error")
    // filtered variant (the second half of the reference scenario)
    val joinedF = run("li_pr, flagdim_pr",
      "WHERE rf = l_returnflag AND l_quantity > 10")
    val plainF = run("li_pr", "WHERE l_quantity > 10")
    assert(joinedF.getDouble(0) === plainF.getDouble(0))
    assert(math.abs(joinedF.getDouble(1) - plainF.getDouble(1)) <=
      math.abs(plainF.getDouble(1)) * 1e-6 + 1e-9)
  }

  // --- JoinQueryTest "Bug AQP-207": dim join + two-column grouping +
  // HAVING on the bare aggregate + bare WITH ERROR ------------------------
  test("AQP-207: dim join, two group columns, HAVING on the aggregate, bare WITH ERROR") {
    gs
    spark.sql("SELECT DISTINCT l_returnflag AS rf, " +
      "concat('label_', l_returnflag) AS label FROM li_pr")
      .createOrReplaceTempView("flagdim207_pr")
    val rows = gs.sql(
      """SELECT sum(l_quantity) AS totalQty, absolute_error(totalQty) AS ae,
        |       l_returnflag, l_linestatus
        |FROM li_pr, flagdim207_pr
        |WHERE rf = l_returnflag AND l_quantity > 0
        |GROUP BY l_returnflag, l_linestatus
        |HAVING sum(l_quantity) > 0 WITH ERROR""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(0) > 0 && !r.isNullAt(1),
        "every surviving group carries a positive estimate and a live error")
    }
  }

  // --- JoinQueryRoutingTestSuite "no route: test semi join" -----------------
  // An EXPLICIT LEFT SEMI JOIN fences both sides (AqpRewrite's join
  // eligibility): the aggregate runs exactly. (An IN-subquery is the OTHER
  // pinned semantic — the subquery stays exact while the outer aggregate
  // may sample, `SubQueryRoutingSpec` "IN subquery on another table".)
  test("explicit LEFT SEMI JOIN with an error clause: aggregates run exactly (no sampling)") {
    gs
    val core =
      """SELECT l_returnflag, sum(l_quantity) AS s
        |FROM li_pr LEFT SEMI JOIN ord_pr
        |  ON l_orderkey = o_orderkey AND o_totalprice > 100000
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    val exact = spark.sql(core).collect().map(r => (r.getString(0), r.getDouble(1)))
    val got = gs.sql(core + " WITH ERROR 0.95 CONFIDENCE 0.95")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq === exact.toSeq,
      "a semi-join aggregate must run exactly — the fencing routes to base")
  }

  test("aliased group column keeps partial routing; mixed column+expression keys never duplicate groups") {
    // aliasing the group column gives its output a fresh exprId — key
    // resolution must chase the alias, or partial routing silently
    // degrades to a full reroute and passing groups lose their estimates
    val dn = gs.sql(
      """SELECT l_linestatus AS gg, sum(l_extendedprice) AS x, relative_error(x) AS re
        |FROM li_pr GROUP BY l_linestatus
        |WITH ERROR 0.5 BEHAVIOR 'do_nothing'""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val res = dn.map(_._3).sorted
    assume(res.distinct.size >= 2, "need distinct per-group errors to split")
    val limit = (res(0) + res(1)) / 2 // exactly one group under the limit
    val passing = dn.filter(_._3 <= limit).map(t => t._1 -> t._2).toMap
    val part = gs.sql(
      s"""SELECT l_linestatus AS gg, sum(l_extendedprice) AS x, relative_error(x) AS re
         |FROM li_pr GROUP BY l_linestatus
         |WITH ERROR $limit BEHAVIOR 'partial_run_on_base_table'""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(part.map(_._1).distinct.length === part.length, "duplicate groups")
    passing.foreach { case (k, v) =>
      val got = part.find(_._1 == k).get._2
      assert(math.abs(got - v) <= 1e-6 * math.abs(v),
        s"passing group $k lost its sample estimate under an aliased key: $got != $v")
    }

    // nested alias chain: the grouping key is itself an alias from a
    // lower Project (chain x→g→l_linestatus, key is the INTERMEDIATE g) —
    // partial routing must still keep passing groups' estimates
    val nested = gs.sql(
      s"""SELECT g AS x2, sum(p) AS x, relative_error(x) AS re
         |FROM (SELECT l_linestatus AS g, l_extendedprice AS p FROM li_pr)
         |GROUP BY g
         |WITH ERROR $limit BEHAVIOR 'partial_run_on_base_table'""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    passing.foreach { case (k, v) =>
      val got = nested.find(_._1 == k).get._2
      assert(math.abs(got - v) <= 1e-6 * math.abs(v),
        s"passing group $k lost its estimate under a NESTED alias chain")
    }

    // duplicate output names: HacExec's fallback semi-join and union are
    // name-based, so a duplicated key name must fall back to a full
    // reroute instead of throwing AMBIGUOUS_REFERENCE
    val dup = gs.sql(
      s"""SELECT l_linestatus AS n, sum(l_extendedprice) AS n
         |FROM li_pr GROUP BY l_linestatus
         |WITH ERROR $limit BEHAVIOR 'partial_run_on_base_table'""".stripMargin)
      .collect()
    assert(dup.length === dn.length,
      "duplicate-name partial query must answer (full reroute), not throw")

    // case-colliding output names: Spark's default resolver is
    // case-INsensitive, so `a AS N, sum(..) AS n` is just as ambiguous to
    // the name-based semi-join as an exact duplicate — the uniqueness
    // check must use the session resolver, not == on the names
    val caseDup = gs.sql(
      s"""SELECT l_linestatus AS N, sum(l_extendedprice) AS n
         |FROM li_pr GROUP BY l_linestatus
         |WITH ERROR $limit BEHAVIOR 'partial_run_on_base_table'""".stripMargin)
      .collect()
    assert(caseDup.length === dn.length,
      "case-colliding-name partial query must answer (full reroute), not throw")

    // mixed keys: only the bare column resolves to an output position; a
    // subset semi-join would pull exact rows for PASSING groups sharing
    // the column value with a failing one and duplicate them in the union
    // — resolution is all-or-nothing, so this must answer with one row
    // per group whatever route it takes, values framed by their bounds
    val mixed = gs.sql(
      s"""SELECT l_linestatus, (l_linenumber % 2) AS par, sum(l_extendedprice) AS x,
         |relative_error(x) AS re
         |FROM li_pr GROUP BY l_linestatus, (l_linenumber % 2)
         |WITH ERROR $limit BEHAVIOR 'partial_run_on_base_table'""".stripMargin)
      .collect().map(r => ((r.getString(0), r.get(1)), r.getDouble(2)))
    assert(mixed.map(_._1).distinct.length === mixed.length,
      s"mixed-key partial routing duplicated groups: ${mixed.map(_._1).mkString(",")}")
    val exactMixed = gs.sql(
      """SELECT l_linestatus, (l_linenumber % 2) AS par, sum(l_extendedprice) AS x
        |FROM li_pr GROUP BY l_linestatus, (l_linenumber % 2)""".stripMargin)
      .collect().map(r => ((r.getString(0), r.get(1)), r.getDouble(2))).toMap
    assert(mixed.map(_._1).toSet === exactMixed.keySet)
  }
}
