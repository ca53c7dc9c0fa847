package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * Third tranche of reference regression scenarios, ported as engine
 * invariants over the synthetic tables:
 *
 *  - `QueryRoutingTestSuite` empty-table HAC matrix ("test empty table with
 *    behaviour involving routing" / "... do nothing" / "test min empty
 *    table"), count-distinct routing ("test count distinct"), and
 *    direct-sample HAC fencing ("test no routing with HAC error constraint
 *    on sample table" + its bootstrap twin);
 *  - `ErrorEstimateFunctionTest` "test bug null error for bootstrap",
 *    "support issue SDENT-63", "ENT-57 aqp query only containing max
 *    function", and the Hashjoin Bug-3 direct-sample join parity;
 *  - `PendingFeatureTest`'s standalone-CONFIDENCE avg (pending in the
 *    reference — supported here).
 */
class CommonBugs3Spec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._

  private lazy val gs: GraftSession = {
    val g = new GraftSession(spark)
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li_cb3")
    g.sql("CREATE SAMPLE TABLE li_cb3_s ON li_cb3 " +
      "OPTIONS(qcs 'l_returnflag', fraction '0.3')")
    g
  }

  override def afterAll(): Unit = {
    val g = new GraftSession(TestSpark.spark)
    GraftState.of(TestSpark.spark).samples.keys
      .filter(n => n.startsWith("li_cb3") || n.startsWith("empty_cb3"))
      .toSeq.foreach(g.dropSampleTable)
    super.afterAll()
  }

  private def setupEmpty(): Unit = {
    import spark.implicits._
    Seq.empty[(Int, String, Double)].toDF("id", "grp", "qty")
      .createOrReplaceTempView("empty_cb3")
    if (!GraftState.of(spark).samples.contains("empty_cb3_s")) {
      gs.sql("CREATE SAMPLE TABLE empty_cb3_s ON empty_cb3 " +
        "OPTIONS(qcs 'grp', fraction '0.2')")
    }
  }

  // --- QueryRoutingTestSuite "test empty table with behaviour involving
  // routing" / "... do nothing": every HAC behavior answers NULL estimate,
  // NULL bounds, zero errors on an empty base+sample — never a throw, never
  // a zero estimate ---------------------------------------------------------
  test("empty base + sample: sum/avg NULL with NULL bounds and zero errors under every behavior") {
    setupEmpty()
    for (agg <- Seq("sum(qty)", "avg(qty)");
         behavior <- Seq("", " BEHAVIOR 'do_nothing'",
           " BEHAVIOR 'run_on_full_table'",
           " BEHAVIOR 'partial_run_on_base_table'")) {
      val r = gs.sql(
        s"""SELECT $agg AS x, lower_bound(x) AS lb, upper_bound(x) AS ub,
           |       relative_error(x) AS re, absolute_error(x) AS ae
           |FROM empty_cb3 WITH ERROR 0.95 CONFIDENCE 0.95$behavior""".stripMargin)
        .collect()(0)
      assert(r.isNullAt(0), s"$agg$behavior: estimate must be NULL on empty")
      assert(r.isNullAt(1) && r.isNullAt(2),
        s"$agg$behavior: bounds must be NULL on empty")
      assert(r.getDouble(3) === 0.0 && r.getDouble(4) === 0.0,
        s"$agg$behavior: errors must be zero on empty")
    }
  }

  // --- QueryRoutingTestSuite "test min empty table" -------------------------
  test("min/max on an empty table answer NULL through every error-clause form") {
    setupEmpty()
    Seq("WITH ERROR 0.95", "WITH ERROR", "WITH ERROR 0.95 CONFIDENCE 0.95",
      "CONFIDENCE 0.95").foreach { clause =>
      val r = gs.sql(
        s"SELECT min(qty) AS mn, max(qty) AS mx, count(qty) AS c " +
          s"FROM empty_cb3 $clause").collect()(0)
      assert(r.isNullAt(0) && r.isNullAt(1),
        s"min/max must be NULL on empty under '$clause'")
      assert(r.getLong(2) === 0L, s"count must be 0 on empty under '$clause'")
    }
  }

  // --- QueryRoutingTestSuite "test count distinct": routes to base, stays
  // exact, and error functions are NULL-bounds / zero-errors ----------------
  test("count(distinct) with error clause: exact, NULL bounds, zero errors") {
    gs
    val exact = spark.sql(
      "SELECT count(distinct l_returnflag) FROM li_cb3").collect()(0).getLong(0)
    val r = gs.sql(
      """SELECT count(distinct l_returnflag) AS c, lower_bound(c) AS lb,
        |       upper_bound(c) AS ub, relative_error(c) AS re,
        |       absolute_error(c) AS ae
        |FROM li_cb3 WITH ERROR 0.2 CONFIDENCE 0.95""".stripMargin).collect()(0)
    assert(r.getLong(0) === exact, "count distinct must route to base exactly")
    assert(r.isNullAt(1) && r.isNullAt(2),
      "bounds of a base-routed distinct aggregate must be NULL")
    assert(r.getDouble(3) === 0.0 && r.getDouble(4) === 0.0,
      "errors of a base-routed distinct aggregate must be 0")
  }

  // --- QueryRoutingTestSuite "test no routing with HAC error constraint on
  // sample table" (+ bootstrap twin): a query fired ON the sample table never
  // reroutes, whatever the behavior says — there is nothing to reroute to ---
  test("direct sample query: HAC behaviors never reroute (closed-form)") {
    gs
    def run(behavior: String) = gs.sql(
      s"""SELECT sum(l_quantity) AS x, lower_bound(x) AS lb, upper_bound(x) AS ub,
         |       relative_error(x) AS re, absolute_error(x) AS ae
         |FROM li_cb3_s WHERE l_orderkey < 300
         |WITH ERROR 0.5 CONFIDENCE 0.95$behavior""".stripMargin).collect()(0)
    val plain = run("")
    val reroute = run(" BEHAVIOR 'run_on_full_table'")
    assert(!plain.isNullAt(1) && !plain.isNullAt(2),
      "direct sample query with error clause must produce bounds")
    (0 until 5).foreach { i =>
      assert(plain.get(i) === reroute.get(i),
        s"column $i must be identical with and without the reroute behavior " +
          "— a direct sample query must not reroute")
    }
  }

  test("direct sample query: HAC behaviors never reroute (bootstrap)") {
    gs
    spark.conf.set("spark.sql.aqp.estimator", "bootstrap")
    spark.conf.set("spark.sql.aqp.fixedSeed", "true")
    try {
      def run(behavior: String) = gs.sql(
        s"""SELECT sum(l_quantity) AS x, lower_bound(x) AS lb, upper_bound(x) AS ub,
           |       relative_error(x) AS re, absolute_error(x) AS ae
           |FROM li_cb3_s WHERE l_orderkey < 300
           |WITH ERROR 0.5 CONFIDENCE 0.95$behavior""".stripMargin).collect()(0)
      val plain = run("")
      val reroute = run(" BEHAVIOR 'run_on_full_table'")
      assert(!plain.isNullAt(1) && !plain.isNullAt(2),
        "bootstrap direct sample query must produce bounds")
      (0 until 5).foreach { i =>
        assert(plain.get(i) === reroute.get(i),
          s"column $i must match across behaviors under bootstrap")
      }
    } finally {
      spark.conf.set("spark.sql.aqp.estimator", "closedform")
      spark.conf.unset("spark.sql.aqp.fixedSeed")
    }
  }

  // --- ErrorEstimateFunctionTest "test bug null error for bootstrap" --------
  test("bootstrap grouped order-by: error columns never null") {
    gs
    spark.conf.set("spark.sql.aqp.estimator", "bootstrap")
    spark.conf.set("spark.sql.aqp.fixedSeed", "true")
    try {
      val rows = gs.sql(
        """SELECT sum(l_quantity) AS s, relative_error(s) AS re,
          |       upper_bound(s) AS ub, l_returnflag
          |FROM li_cb3 GROUP BY l_returnflag ORDER BY s
          |WITH ERROR 0.3 CONFIDENCE 0.95 BEHAVIOR 'do_nothing'""".stripMargin)
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { row =>
        assert(!row.isNullAt(1) && !row.isNullAt(2),
          s"bootstrap error columns must never be null, got $row")
      }
    } finally {
      spark.conf.set("spark.sql.aqp.estimator", "closedform")
      spark.conf.unset("spark.sql.aqp.fixedSeed")
    }
  }

  // --- ErrorEstimateFunctionTest "support issue SDENT-63" -------------------
  test("SDENT-63: compound sum/count ratio with MAX(FALSE) under local_omit") {
    gs
    val rows = gs.sql(
      """SELECT l_returnflag AS z, (SUM(l_quantity) / COUNT(l_quantity)) AS x,
        |       MAX(FALSE) AS y
        |FROM li_cb3 GROUP BY l_returnflag
        |WITH ERROR 0.95 BEHAVIOR 'local_omit'""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(1)) assert(r.getDouble(1) > 0)
      if (!r.isNullAt(2)) assert(r.getBoolean(2) === false)
    }
  }

  // --- ErrorEstimateFunctionTest "ENT-57. aqp query only containing max
  // function should use sample table if possible" ---------------------------
  test("ENT-57: only-max/min query answers exactly; error functions on min/max are inert") {
    gs
    val exact = spark.sql(
      "SELECT max(l_quantity), min(l_quantity) FROM li_cb3").collect()(0)
    val r = gs.sql(
      "SELECT max(l_quantity) AS mx, min(l_quantity) AS mn FROM li_cb3 WITH ERROR")
      .collect()(0)
    assert(r.getDouble(0) === exact.getDouble(0) &&
      r.getDouble(1) === exact.getDouble(1),
      "a max/min-only AQP query must answer the exact extremes")
    // error functions applied to min/max: bounds NULL, errors 0 (the
    // reference pins exactly this shape)
    val r2 = gs.sql(
      """SELECT max(l_quantity) AS mx, min(l_quantity) AS mn,
        |       lower_bound(mx) AS lb, upper_bound(mx) AS ub,
        |       absolute_error(mx) AS ae, relative_error(mx) AS re,
        |       absolute_error(mn) AS ae2
        |FROM li_cb3 WITH ERROR""".stripMargin).collect()(0)
    assert(r2.getDouble(0) === exact.getDouble(0) &&
      r2.getDouble(1) === exact.getDouble(1))
    assert(r2.isNullAt(2) && r2.isNullAt(3),
      "bounds of a min/max aggregate must be NULL")
    assert(r2.getDouble(4) === 0.0 && r2.getDouble(5) === 0.0 &&
      r2.getDouble(6) === 0.0,
      "errors of a min/max aggregate must be 0")
  }

  // --- ErrorEstimateFunctionTest "query directly fired on sample table
  // should not compute error estimates if no error clause present" vs the
  // "error fraction" scenario: an explicit error clause turns estimates on -
  test("direct sample query: inert without an error clause, estimating with one") {
    gs
    // without a clause: plain Spark semantics — raw unweighted sum over the
    // sample rows; error functions inert
    val raw = spark.table("li_cb3_s")
      .agg(sum(col("l_quantity"))).collect()(0).getDouble(0)
    val inert = gs.sql(
      "SELECT sum(l_quantity) AS x, relative_error(x) AS re FROM li_cb3_s")
      .collect()(0)
    assert(math.abs(inert.getDouble(0) - raw) < 1e-6,
      "without an error clause a direct sample query is a plain query")
    // with an explicit clause: weighted estimate + live bounds
    val est = gs.sql(
      """SELECT sum(l_quantity) AS x, lower_bound(x) AS lb, upper_bound(x) AS ub
        |FROM li_cb3_s WITH ERROR 0.7""".stripMargin).collect()(0)
    assert(est.getDouble(0) > raw,
      "with an error clause the sample rows are weighted up to the base scale")
    assert(!est.isNullAt(1) && !est.isNullAt(2))
  }

  // --- CompareBootstrapClosedFormSuite: both estimators are
  // Horvitz–Thompson weighted, so their POINT estimates must agree exactly
  // on the same sample — only the error machinery differs ------------------
  test("bootstrap and closed-form point estimates agree exactly on one sample") {
    gs
    def run() = gs.sql(
      """SELECT l_returnflag, round(sum(l_quantity), 6) AS s,
        |       round(avg(l_extendedprice), 6) AS a, count(*) AS c,
        |       absolute_error(s) AS ae
        |FROM li_cb3 GROUP BY l_returnflag ORDER BY l_returnflag
        |WITH ERROR 0.5 CONFIDENCE 0.95""".stripMargin).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    val cf = run()
    spark.conf.set("spark.sql.aqp.estimator", "bootstrap")
    spark.conf.set("spark.sql.aqp.fixedSeed", "true")
    val bs = try run() finally {
      spark.conf.set("spark.sql.aqp.estimator", "closedform")
      spark.conf.unset("spark.sql.aqp.fixedSeed")
    }
    cf.zip(bs).foreach { case ((kf, sf1, af, cfn), (kb, sb, ab, cbn)) =>
      assert(kf === kb)
      assert(math.abs(sf1 - sb) <= 1e-6, s"sum estimates must agree for $kf")
      assert(math.abs(af - ab) <= 1e-6, s"avg estimates must agree for $kf")
      assert(math.abs(cfn - cbn) <= 1, s"count estimates must agree for $kf")
    }
  }

  // --- AbstractViewTest "SNAP-3131": a projection view over the base is
  // AQP-transparent — estimates AND error columns equal the base query ----
  test("SNAP-3131: projection view over the base equals the base query incl. error columns") {
    gs
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW li_cb3_view AS " +
      "SELECT l_returnflag, l_quantity, l_extendedprice FROM li_cb3")
    def run(tbl: String) = gs.sql(
      s"""SELECT avg(l_extendedprice) AS avgg, sum(l_quantity) AS suum,
         |       count(*) AS couunt, absolute_error(suum) AS ae_s,
         |       relative_error(suum) AS re_s, absolute_error(avgg) AS ae_a,
         |       absolute_error(couunt) AS ae_c
         |FROM $tbl WITH ERROR 0.3""".stripMargin).collect()(0)
    val v = run("li_cb3_view")
    val b = run("li_cb3")
    (0 until 7).foreach { i =>
      assert(v.get(i) === b.get(i),
        s"view column $i must equal the base query (AQP must see through " +
          "the projection view)")
    }
  }

  // --- BootStrapAggregateFunctionTest "Verify position of bootstrap seed
  // is above the filter / below the join": in the reference the seed must
  // be PLACED carefully so filters and joins cannot perturb per-row
  // multiplicities. Here the multiplicity stream is a pure function of the
  // sample row's content, so the same guarantee is structural — pinned by
  // observing that logically equivalent predicates and row-preserving
  // joins leave the bootstrap estimate AND its error bit-identical --------
  test("bootstrap multiplicities are row-content functions: predicate form and dim joins cannot perturb them") {
    gs
    spark.conf.set("spark.sql.aqp.estimator", "bootstrap")
    spark.sql("SELECT DISTINCT l_returnflag AS rf FROM li_cb3")
      .createOrReplaceTempView("flagdim_bs_cb3")
    try {
      def run(from: String, where: String) = gs.sql(
        s"""SELECT round(sum(l_quantity), 6) AS s, absolute_error(s) AS ae,
           |       relative_error(s) AS re
           |FROM $from WHERE $where
           |WITH ERROR 0.9 CONFIDENCE 0.95""".stripMargin).collect()(0)
      val direct = run("li_cb3", "l_quantity > 10")
      val rewrittenPred = run("li_cb3", "NOT (l_quantity <= 10)")
      (0 until 3).foreach { i =>
        assert(direct.get(i) === rewrittenPred.get(i),
          s"col $i: an equivalent predicate form must not change the " +
            "multiplicity draw")
      }
      val joined = run("li_cb3, flagdim_bs_cb3",
        "rf = l_returnflag AND l_quantity > 10")
      assert(direct.getDouble(0) === joined.getDouble(0),
        "a row-preserving dim join must not change the bootstrap estimate")
      assert(math.abs(direct.getDouble(1) - joined.getDouble(1)) <=
        math.abs(direct.getDouble(1)) * 1e-9 + 1e-9,
        "a row-preserving dim join must not change the bootstrap error")
      // a DataFrame pre-projection that DROPS the base columns must draw
      // the same per-row multiplicities as the SQL form — the seed rides
      // the sample scan, not whatever columns the query happens to keep
      // (without this, same-valued rows of a stratum share a draw and the
      // variance inflates ~40x)
      import graft.aqp.functions._
      import graft.implicits._
      val viaSql = gs.sql(
        """SELECT round(sum(l_quantity * 2), 6) AS s, relative_error(s) AS re
          |FROM li_cb3 WITH ERROR 0.9 CONFIDENCE 0.95""".stripMargin).collect()(0)
      val viaDf = spark.table("li_cb3")
        .select((col("l_quantity") * 2).as("y"))
        .agg(round(sum(col("y")), 6).as("s"), relative_error("s"))
        .withError(0.9, 0.95, "do_nothing").collect()(0)
      assert(viaDf.getDouble(0) === viaSql.getDouble(0))
      assert(math.abs(viaDf.getDouble(1) - viaSql.getDouble(1)) <= 1e-9,
        "pre-projected DataFrame and SQL forms must share the multiplicity draw")
    } finally spark.conf.set("spark.sql.aqp.estimator", "closedform")
  }

  // --- bootstrap through Generate (explode) and Window: the threaded
  // per-row seed must survive both operators like the weight does (every
  // exploded row shares its SOURCE row's draw — the resampling unit is the
  // sampled row, not the exploded one) -------------------------------------
  test("bootstrap threads the seed through explode and window operators") {
    gs
    spark.conf.set("spark.sql.aqp.estimator", "bootstrap")
    try {
      val exploded = gs.sql(
        """SELECT sum(part) AS s, absolute_error(s) AS ae
          |FROM (SELECT explode(array(l_quantity, l_quantity)) AS part
          |      FROM li_cb3)
          |WITH ERROR 0.9 CONFIDENCE 0.95""".stripMargin).collect()(0)
      assert(!exploded.isNullAt(0) && !exploded.isNullAt(1) &&
        exploded.getDouble(1) > 0.0,
        s"bootstrap explode query must carry live errors, got $exploded")
      val windowed = gs.sql(
        """SELECT l_returnflag, round(sum(rk), 4) AS s, absolute_error(s) AS ae
          |FROM (SELECT l_returnflag,
          |             row_number() OVER (PARTITION BY l_returnflag
          |                                ORDER BY l_orderkey) AS rk
          |      FROM li_cb3)
          |GROUP BY l_returnflag ORDER BY l_returnflag
          |WITH ERROR 0.9 CONFIDENCE 0.95""".stripMargin).collect()
      assert(windowed.nonEmpty)
      windowed.foreach(r => assert(!r.isNullAt(2),
        "bootstrap window query must carry live errors"))
    } finally spark.conf.set("spark.sql.aqp.estimator", "closedform")
  }

  // --- CommonBugTest "SNAP-806 decimal column not handled correctly":
  // DECIMAL measures through the whole AQP spread — estimates keep the
  // decimal result types, nothing comes back null, and at full fraction
  // the estimates equal the exact decimal aggregates -----------------------
  test("SNAP-806: decimal measures through sum/avg/count with error functions") {
    import spark.implicits._
    gs
    val dec = (1 to 300).map(i =>
        (i, s"g${i % 3}", BigDecimal(i).setScale(2) / 7, BigDecimal(i * 100).setScale(4) / 3))
      .toDF("id", "grp", "qty", "amount")
      .selectExpr("id", "grp", "CAST(qty AS DECIMAL(10,2)) AS qty",
        "CAST(amount AS DECIMAL(14,4)) AS amount")
    dec.createOrReplaceTempView("dec_cb3")
    gs.sql("CREATE SAMPLE TABLE dec_cb3_s ON dec_cb3 " +
      "OPTIONS(qcs 'grp', fraction '1.0')")
    try {
      val exact = spark.sql(
        """SELECT grp, sum(qty), sum(amount), avg(qty), avg(amount), count(*)
          |FROM dec_cb3 GROUP BY grp ORDER BY grp""".stripMargin).collect()
      val rows = gs.sql(
        """SELECT grp, sum(qty) AS sum_qty, sum(amount) AS sum_amount,
          |       avg(qty) AS avg_qty, avg(amount) AS avg_amount,
          |       count(*) AS count_order, absolute_error(sum_qty) AS ae
          |FROM dec_cb3 GROUP BY grp ORDER BY grp
          |WITH ERROR 0.2 CONFIDENCE 0.95""".stripMargin).collect()
      assert(rows.length === exact.length)
      rows.zip(exact).foreach { case (r, e) =>
        (0 until 7).foreach(i => assert(!r.isNullAt(i),
          s"SNAP-806: no column may be null, got $r"))
        // full fraction: decimal estimates equal the exact aggregates
        assert(r.getDecimal(1) === e.getDecimal(1), "sum(decimal) exact")
        assert(r.getDecimal(2) === e.getDecimal(2), "sum(decimal 14,4) exact")
        assert(r.getDecimal(3) === e.getDecimal(3), "avg(decimal) exact")
        assert(r.getDecimal(4) === e.getDecimal(4), "avg(decimal 14,4) exact")
        assert(r.getLong(5) === e.getLong(5))
        assert(r.getDouble(6) === 0.0, "full fraction: zero error")
      }
    } finally gs.dropSampleTable("dec_cb3_s")
  }

  // --- PendingFeatureTest (ignored there — "Sample Table Query on avg
  // aggregate with error estimates should be correct"): a standalone
  // CONFIDENCE clause must route and estimate ------------------------------
  test("standalone CONFIDENCE clause: avg estimates through the sample (reference pending feature)") {
    gs
    val exact = spark.sql("SELECT avg(l_quantity) FROM li_cb3")
      .collect()(0).getDouble(0)
    val est = gs.sql("SELECT avg(l_quantity) AS a FROM li_cb3 CONFIDENCE 0.95")
      .collect()(0).getDouble(0)
    assert(math.abs(est - exact) / exact < 0.2,
      s"standalone-CONFIDENCE avg must estimate the base avg (got $est vs $exact)")
  }

  // --- CommonBugTest "SNAP-823 test null for error stats": the all-NULL
  // column matrix is DISTINCT from the empty table — count(allNull) is 0
  // with NULL error columns (no variance is estimable), a MIXED column has
  // live errors, and sum(allNull) is NULL throughout. (The empty TABLE, by
  // contrast, reports ZERO errors — QueryRoutingTestSuite.) -----------------
  test("SNAP-823: error stats over all-NULL vs mixed columns") {
    import spark.implicits._
    gs
    (1 to 300).map(i =>
        (i, s"g${i % 3}", None: Option[Double],
          if (i % 2 == 0) Some(i.toDouble) else None))
      .toDF("id", "grp", "qty_null", "qty_mix")
      .createOrReplaceTempView("sn823_cb3")
    gs.sql("CREATE SAMPLE TABLE sn823_cb3_s ON sn823_cb3 " +
      "OPTIONS(qcs 'grp', fraction '0.5')")
    try {
      def run(agg: String) = gs.sql(
        s"""SELECT $agg AS x, absolute_error(x) AS ae, relative_error(x) AS re,
           |       lower_bound(x) AS lb, upper_bound(x) AS ub
           |FROM sn823_cb3 WITH ERROR 0.2 CONFIDENCE 0.95""".stripMargin)
        .collect()(0)
      val cntNull = run("count(qty_null)")
      assert(!cntNull.isNullAt(0) && cntNull.getLong(0) === 0L)
      assert((1 to 4).forall(cntNull.isNullAt),
        s"count over an all-NULL column has NULL error stats, got $cntNull")
      val cntMix = run("count(qty_mix)")
      assert(!cntMix.isNullAt(0) && cntMix.getLong(0) > 0)
      assert((1 to 4).forall(i => !cntMix.isNullAt(i)),
        s"count over a mixed column has live error stats, got $cntMix")
      val sumNull = run("sum(qty_null)")
      assert((0 to 4).forall(sumNull.isNullAt),
        s"sum over an all-NULL column is NULL throughout, got $sumNull")
      val sumMix = run("sum(qty_mix)")
      assert((0 to 4).forall(i => !sumMix.isNullAt(i)),
        s"sum over a mixed column has live error stats, got $sumMix")
    } finally gs.dropSampleTable("sn823_cb3_s")
  }

  // --- BootStrapBugTest "Test sample table query on mixed aggregates with
  // group by": the sum/avg/count columns of ONE query must equal the three
  // single-aggregate queries column-for-column (the struct-sharing rewrite
  // must not perturb any individual estimate) ------------------------------
  test("mixed sum/avg/count query equals the three single-aggregate queries") {
    gs
    def one(agg: String) = gs.sql(
      s"""SELECT $agg AS x, l_returnflag, absolute_error(x) AS ae
         |FROM li_cb3 GROUP BY l_returnflag ORDER BY l_returnflag
         |WITH ERROR 0.2 CONFIDENCE 0.95""".stripMargin).collect()
    val mixed = gs.sql(
      """SELECT sum(l_quantity) AS x, avg(l_quantity) AS y,
        |       count(l_quantity) AS z, l_returnflag, absolute_error(x) AS ae
        |FROM li_cb3 GROUP BY l_returnflag ORDER BY l_returnflag
        |WITH ERROR 0.2 CONFIDENCE 0.95""".stripMargin).collect()
    val (s, a, c) =
      (one("sum(l_quantity)"), one("avg(l_quantity)"), one("count(l_quantity)"))
    mixed.indices.foreach { i =>
      assert(mixed(i).getDouble(0) === s(i).getDouble(0), s"sum row $i")
      assert(mixed(i).getDouble(1) === a(i).getDouble(0), s"avg row $i")
      assert(mixed(i).getLong(2) === c(i).getLong(0), s"count row $i")
      assert(mixed(i).getString(3) === s(i).getString(1), s"group row $i")
    }
  }

  // --- BootStrapBugTest "having clause containing aggregate function": the
  // HAVING references the aggregate FUNCTION, not its alias ----------------
  test("HAVING with a bare aggregate function filters the estimated values") {
    gs
    val all = gs.sql(
      """SELECT avg(l_quantity) AS x, l_returnflag, absolute_error(x) AS ae
        |FROM li_cb3 GROUP BY l_returnflag
        |WITH ERROR 0.2 CONFIDENCE 0.95""".stripMargin).collect()
      .map(r => (r.getString(1), r.getDouble(0))).toMap
    val kept = gs.sql(
      """SELECT avg(l_quantity) AS x, l_returnflag, absolute_error(x) AS ae
        |FROM li_cb3 GROUP BY l_returnflag
        |HAVING avg(l_quantity) > 25
        |WITH ERROR 0.2 CONFIDENCE 0.95""".stripMargin).collect()
      .map(r => (r.getString(1), r.getDouble(0))).toMap
    assert(kept === all.filter(_._2 > 25),
      "HAVING on the bare aggregate must filter by the ESTIMATED value")
  }

  // --- CommonBugTest "Test Bug AQP-128 and AQP 96 and AQP-206_AQP77":
  // keyword-colliding aliases (COUNT / COUNT1) on duplicated aggregates,
  // with the error function bound case-insensitively to the second alias,
  // plus HAVING on a live error function --------------------------------
  test("AQP-128/96/206/77: keyword aliases, case-insensitive binding, HAVING on relative_error") {
    gs
    val rows = gs.sql(
      """SELECT l_returnflag, avg(l_quantity) AS COUNT, avg(l_quantity) AS COUNT1,
        |       absolute_error(count1) AS ae
        |FROM li_cb3 WHERE l_orderkey < 3000 GROUP BY l_returnflag
        |ORDER BY l_returnflag DESC WITH ERROR 0.3""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-4,
        "duplicated aggregates under keyword aliases must agree")
      assert(!r.isNullAt(3), "absolute_error(count1) must bind to COUNT1")
    }
    // HAVING filters by the LIVE relative error value
    val hv = gs.sql(
      """SELECT l_returnflag, sum(l_quantity) AS x, absolute_error(x) AS ae,
        |       relative_error(x) AS re
        |FROM li_cb3 GROUP BY l_returnflag
        |HAVING relative_error(x) < 0.9
        |ORDER BY l_returnflag DESC WITH ERROR""".stripMargin).collect()
    assert(hv.nonEmpty)
    hv.foreach(r => assert(r.getDouble(3) < 0.9,
      "HAVING on relative_error must filter by the computed value"))
  }

  // --- ErrorEstimateFunctionTest "Hashjoin Bug-3": a direct-sample join
  // answers the same counts and weight sums whichever join strategy runs ----
  test("Hashjoin Bug-3: direct-sample join parity incl. weight-column sum across join strategies") {
    gs
    spark.read.parquet(s"$sf/region.parquet").selectExpr(
      "r_regionkey % 3 AS code", "r_name").createOrReplaceTempView("ref_cb3")
    spark.sql("SELECT DISTINCT l_returnflag, abs(hash(l_returnflag)) % 3 AS code " +
      "FROM li_cb3").createOrReplaceTempView("flagmap_cb3")
    def run() = gs.sql(
      s"""SELECT count(*) AS c, count(*) AS sample_count,
         |       sum(${org.apache.spark.sql.graft.Weightage.WeightColumn}) AS w
         |FROM li_cb3_s t1, flagmap_cb3 t2
         |WHERE t1.l_returnflag = t2.l_returnflag WITH ERROR""".stripMargin)
      .collect()(0)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val broadcastPlan = run()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val shufflePlan =
      try run()
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    assert(broadcastPlan.getLong(1) === shufflePlan.getLong(1),
      "sample_count must not depend on the join strategy")
    assert(broadcastPlan.getLong(2) === shufflePlan.getLong(2),
      "the packed weight sum must not depend on the join strategy")
    assert(math.abs(broadcastPlan.getLong(0) - shufflePlan.getLong(0)) < 2)
  }
}
