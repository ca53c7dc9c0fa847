package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * Second tranche of reference regression scenarios (reference
 * `CommonBugTest.scala` / `ErrorEstimateFunctionTest.scala:799+`), ported
 * as engine invariants over the synthetic tables: null-column aggregates,
 * zero-sum error bounds, repeated/duplicate aggregates, ORDER BY on error
 * functions, function-expression QCS accuracy, bypass-vs-full estimate
 * parity, and sampled-relation transformation fencing.
 */
class CommonBugs2Spec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._

  private lazy val gs: GraftSession = {
    val g = new GraftSession(spark)
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li_cb2")
    g.sql("CREATE SAMPLE TABLE li_cb2_s ON li_cb2 " +
      "OPTIONS(qcs 'l_returnflag', fraction '0.3')")
    g
  }

  override def afterAll(): Unit = {
    val g = new GraftSession(TestSpark.spark)
    GraftState.of(TestSpark.spark).samples.keys
      .filter(_.startsWith("li_cb2")).toSeq.foreach(g.dropSampleTable)
    GraftState.of(TestSpark.spark).samples.keys
      .filter(_.startsWith("nulls_cb2")).toSeq.foreach(g.dropSampleTable)
    super.afterAll()
  }

  // --- CommonBugTest "count aggregate query with column name" ---------------
  test("count(col) with error function and filter answers without exception") {
    gs
    val r = gs.sql(
      """SELECT count(l_orderkey) AS x, absolute_error(x) AS ae
        |FROM li_cb2 WHERE l_orderkey > 0 WITH ERROR 0.5""".stripMargin)
      .collect()(0)
    assert(r.getLong(0) > 0 && !r.isNullAt(1))
  }

  // --- CommonBugTest "null columns for aggregates : test 1" -----------------
  test("all-null aggregate column: count(*)>0, sum/avg NULL, count(col)=0, on base and sample") {
    import spark.implicits._
    val nulls = (1 to 200).map(i => (i, s"g${i % 4}", None: Option[Double]))
      .toDF("id", "grp", "qty")
    nulls.createOrReplaceTempView("nulls_cb2")
    gs.sql("CREATE SAMPLE TABLE nulls_cb2_s ON nulls_cb2 " +
      "OPTIONS(qcs 'grp', fraction '0.5')")
    // base-table semantics
    val b = spark.sql("SELECT count(*) AS cs, avg(qty) AS a, sum(qty) AS s, " +
      "count(qty) AS cc FROM nulls_cb2").collect()(0)
    assert(b.getLong(0) === 200L && b.isNullAt(1) && b.isNullAt(2) && b.getLong(3) === 0L)
    // the same invariants through the AQP path with an error estimate column
    val s = gs.sql(
      """SELECT count(*) AS cs, avg(qty) AS a, sum(qty) AS s, count(qty) AS cc,
        |       absolute_error(cs) AS ae
        |FROM nulls_cb2 WITH ERROR 0.9""".stripMargin).collect()(0)
    assert(s.getLong(0) === 200L, "weighted count(*) of a full-coverage sample")
    assert(s.isNullAt(1) && s.isNullAt(2), "sum/avg over all-null stay null")
    assert(s.getLong(3) === 0L, "count(col) over all-null is 0")
    assert(!s.isNullAt(4))
  }

  // --- CommonBugTest "null columns for aggregates : test 2" -----------------
  test("filter matching no rows: sum/avg NULL, counts 0, through the error path") {
    val r = gs.sql(
      """SELECT sum(l_quantity) AS x, count(l_quantity) AS y, count(*) AS z,
        |       avg(l_quantity) AS p
        |FROM li_cb2 WHERE l_returnflag = 'ZZ' WITH ERROR 0.9 CONFIDENCE 0.95""".stripMargin)
      .collect()(0)
    assert(r.isNullAt(0) && r.getLong(1) === 0L && r.getLong(2) === 0L && r.isNullAt(3))
  }

  // --- CommonBugTest "NPE in bootstrap error bounds when sum or avg is 0" ---
  test("zero-valued groups produce non-null error bounds (no NPE)") {
    import spark.implicits._
    // one row per stratum, values starting at 0 — the 'name_0' group has
    // sum = avg = 0, which NPE'd the reference's bound finalizer
    val df = (0 until 100).map(i => (s"name_$i", i)).toDF("name", "value")
    df.createOrReplaceTempView("zeros_cb2")
    gs.sql("CREATE SAMPLE TABLE zeros_cb2_s ON zeros_cb2 " +
      "OPTIONS(qcs 'name', fraction '1.0')")
    Seq("avg", "sum").foreach { agg =>
      val rows = gs.sql(
        s"""SELECT $agg(value) AS v, lower_bound(v) AS lb, upper_bound(v) AS ub,
           |       absolute_error(v) AS ae, relative_error(v) AS re
           |FROM zeros_cb2 GROUP BY name WITH ERROR 0.9""".stripMargin).collect()
      assert(rows.length === 100)
      rows.foreach { r =>
        (0 until 5).foreach(i => assert(!r.isNullAt(i), s"$agg col $i null in $r"))
      }
    }
    new GraftSession(spark).dropSampleTable("zeros_cb2_s")
  }

  // --- CommonBugTest "Test conistency of sum , count & average queries" -----
  test("repeated identical WITH ERROR queries return identical estimates") {
    def run(agg: String): Seq[Double] = gs.sql(
      s"""SELECT $agg(l_quantity) AS v, lower_bound(v) AS lb, upper_bound(v) AS ub
         |FROM li_cb2 WITH ERROR 0.9 CONFIDENCE 0.95""".stripMargin)
      .collect().map(r => r.getDouble(0)).toSeq
    Seq("sum", "avg").foreach { agg =>
      assert(run(agg) === run(agg), s"$agg must be deterministic across runs")
    }
    def runCount(): Long = gs.sql(
      """SELECT count(l_quantity) AS v, lower_bound(v) AS lb, upper_bound(v) AS ub
        |FROM li_cb2 WITH ERROR 0.9 CONFIDENCE 0.95""".stripMargin)
      .collect()(0).getLong(0)
    assert(runCount() === runCount())
  }

  // --- CommonBugTest "Test repeat aggregates" --------------------------------
  test("the same aggregate aliased three times yields identical columns") {
    val rows1 = gs.sql(
      """SELECT l_returnflag, avg(l_quantity) AS a1, avg(l_quantity) AS a2,
        |       avg(l_quantity) AS a3, absolute_error(a1) AS ae
        |FROM li_cb2 GROUP BY l_returnflag WITH ERROR 0.9 BEHAVIOR 'do_nothing'""".stripMargin)
      .collect()
    assert(rows1.nonEmpty)
    rows1.foreach { r =>
      assert(r.getDouble(1) === r.getDouble(2) && r.getDouble(2) === r.getDouble(3))
    }
    val rows2 = gs.sql(
      """SELECT l_returnflag, sum(l_quantity) AS s1, sum(l_quantity) AS s2,
        |       sum(l_quantity) AS s3, absolute_error(s1) AS ae
        |FROM li_cb2 GROUP BY l_returnflag WITH ERROR 0.9 BEHAVIOR 'do_nothing'""".stripMargin)
      .collect()
    rows2.foreach { r =>
      assert(r.getDouble(1) === r.getDouble(2) && r.getDouble(2) === r.getDouble(3))
    }
    val rows3 = gs.sql(
      """SELECT l_returnflag, count(*) AS c1, count(*) AS c2, count(*) AS c3,
        |       absolute_error(c1) AS ae
        |FROM li_cb2 GROUP BY l_returnflag WITH ERROR 0.9 BEHAVIOR 'do_nothing'""".stripMargin)
      .collect()
    rows3.foreach { r =>
      assert(r.getLong(1) === r.getLong(2) && r.getLong(2) === r.getLong(3))
    }
    // HAVING over the repeated aggregate filters on the same value
    val rows4 = gs.sql(
      """SELECT l_returnflag, avg(l_quantity) AS a1, avg(l_quantity) AS a2
        |FROM li_cb2 GROUP BY l_returnflag HAVING avg(l_quantity) > 25
        |WITH ERROR 0.9 BEHAVIOR 'do_nothing'""".stripMargin).collect()
    rows4.foreach { r =>
      assert(r.getDouble(1) === r.getDouble(2) && r.getDouble(2) > 25)
    }
  }

  // --- CommonBugTest "Bug AQP-130 order by on error functions" --------------
  test("AQP-130: ORDER BY on error functions sorts by them (direct, aliased, repeated)") {
    def assertSorted(rows: Array[org.apache.spark.sql.Row], col: Int): Unit = {
      assert(rows.length > 1)
      rows.sliding(2).foreach { w =>
        assert(w(0).getDouble(col) <= w(1).getDouble(col),
          s"not sorted: ${w(0)} > ${w(1)}")
      }
    }
    // direct error-function reference in ORDER BY
    assertSorted(gs.sql(
      """SELECT l_returnflag, sum(l_quantity) AS s, absolute_error(s) AS ae
        |FROM li_cb2 GROUP BY l_returnflag ORDER BY absolute_error(s)
        |WITH ERROR""".stripMargin).collect(), 2)
    // relative_error, direct
    assertSorted(gs.sql(
      """SELECT l_returnflag, avg(l_quantity) AS a, relative_error(a) AS re
        |FROM li_cb2 GROUP BY l_returnflag ORDER BY relative_error(a)
        |WITH ERROR""".stripMargin).collect(), 2)
    // aliased error column in ORDER BY
    assertSorted(gs.sql(
      """SELECT l_returnflag, avg(l_quantity) AS a, relative_error(a) AS err
        |FROM li_cb2 GROUP BY l_returnflag ORDER BY err
        |WITH ERROR""".stripMargin).collect(), 2)
  }

  // --- CommonBugTest AQP-154/204/205/94/207 ----------------------------------
  test("AQP-154/204/205: sample count vs estimated count vs actual; ordered-limit stability") {
    gs // force sample creation
    val sampleRows = spark.table("li_cb2_s").count()
    assert(sampleRows > 0)
    // estimated base count from the sample ≈ actual
    val est = gs.sql(
      """SELECT count(*) AS c, absolute_error(c) AS ae
        |FROM li_cb2 WITH ERROR 0.9""".stripMargin).collect()(0)
    val actual = spark.table("li_cb2").count()
    assert(math.abs(est.getLong(0) - actual) <= math.max(3, est.getDouble(1) * 5),
      s"estimated ${est.getLong(0)} vs actual $actual")
    // repeated ordered-limit with-error queries return identical rows
    def q(): Array[(String, Double)] = gs.sql(
      """SELECT l_linestatus, avg(l_extendedprice) AS ap, absolute_error(ap) AS ae
        |FROM li_cb2 WHERE l_quantity > 1 GROUP BY l_linestatus
        |ORDER BY l_linestatus, ap DESC LIMIT 10 WITH ERROR""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val r1 = q(); val r2 = q(); val r3 = q()
    assert(r1.sameElements(r2) && r1.sameElements(r3))
  }

  // --- CommonBugTest AQP-214 --------------------------------------------------
  test("AQP-214: grouped count-with-error tracks the exact grouped count") {
    val approx = gs.sql(
      """SELECT l_linestatus, count(*) AS c, absolute_error(c) AS ae
        |FROM li_cb2 GROUP BY l_linestatus ORDER BY l_linestatus
        |WITH ERROR""".stripMargin).collect()
    val exact = spark.sql(
      "SELECT l_linestatus, count(*) AS c FROM li_cb2 " +
        "GROUP BY l_linestatus ORDER BY l_linestatus").collect()
    assert(approx.length === exact.length && approx.nonEmpty)
    approx.zip(exact).foreach { case (a, e) =>
      assert(a.getString(0) === e.getString(0))
      assert(math.abs(a.getLong(1) - e.getLong(1)) <=
        math.max(3, a.getDouble(2) * 5), s"$a vs $e")
    }
  }

  // --- CommonBugTest "Bug NPE in getting sample_count" -----------------------
  test("count(*) over a sample on an all-null-column table answers (no NPE)") {
    import spark.implicits._
    val nulls = (1 to 50).map(i => (i, None: Option[Double])).toDF("id", "qty")
    nulls.createOrReplaceTempView("nulls13_cb2")
    gs.sql("CREATE SAMPLE TABLE nulls13_cb2_s ON nulls13_cb2 " +
      "OPTIONS(qcs 'id', fraction '0.5')")
    val n = gs.sql("SELECT count(*) AS c FROM nulls13_cb2_s").collect()(0).getLong(0)
    assert(n > 0)
    new GraftSession(spark).dropSampleTable("nulls13_cb2_s")
  }

  // --- ErrorEstimateFunctionTest:834/845 --------------------------------------
  test("ordered-limit strict query within limit: bounds present, no enforcement throw") {
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li_cb2f")
    gs.sql("CREATE SAMPLE TABLE li_cb2f_s ON li_cb2f " +
      "OPTIONS(qcs 'l_returnflag', fraction '1.0')")
    val rows = gs.sql(
      """SELECT sum(l_extendedprice) AS s, relative_error(s) AS re,
        |       upper_bound(s) AS ub, lower_bound(s) AS lb, l_returnflag
        |FROM li_cb2f GROUP BY l_returnflag ORDER BY s DESC LIMIT 5
        |WITH ERROR 0.05 CONFIDENCE 0.95 BEHAVIOR 'strict'""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(!r.isNullAt(1) && !r.isNullAt(2) && !r.isNullAt(3)))
    new GraftSession(spark).dropSampleTable("li_cb2f_s")
  }

  test("do_nothing grouped query never returns null error columns") {
    val rows = gs.sql(
      """SELECT sum(l_quantity) AS s, relative_error(s) AS re, upper_bound(s) AS ub,
        |       l_returnflag
        |FROM li_cb2 GROUP BY l_returnflag ORDER BY s
        |WITH ERROR 0.3 CONFIDENCE 0.95 BEHAVIOR 'do_nothing'""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(!r.isNullAt(1) && !r.isNullAt(2)))
  }

  // --- ErrorEstimateFunctionTest:853 ------------------------------------------
  test("count accuracy when the QCS is a function expression of the grouped column") {
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li_cb2g")
    gs.sql("CREATE SAMPLE TABLE li_cb2g_s ON li_cb2g " +
      "OPTIONS(qcs 'round(l_quantity / 10)', fraction '0.2')")
    val approx = gs.sql(
      """SELECT count(*) AS cnt, relative_error(cnt) AS re, round(l_quantity / 10) AS b
        |FROM li_cb2g GROUP BY round(l_quantity / 10) ORDER BY b
        |WITH ERROR 0.3 BEHAVIOR 'do_nothing'""".stripMargin).collect()
    val exact = spark.sql(
      """SELECT count(*) AS cnt, round(l_quantity / 10) AS b
        |FROM li_cb2g GROUP BY round(l_quantity / 10) ORDER BY b""".stripMargin).collect()
    assert(approx.length === exact.length && approx.nonEmpty)
    // group-by == QCS: the ratio-preserving weights make per-stratum counts
    // near-exact (reference asserts |diff| < 2)
    approx.zip(exact).foreach { case (a, e) =>
      assert(math.abs(a.getLong(0) - e.getLong(0)) < 2, s"$a vs $e")
    }
    new GraftSession(spark).dropSampleTable("li_cb2g_s")
  }

  // --- ErrorEstimateFunctionTest:872 "bypass error calculation" ---------------
  test("estimates identical with and without error-function columns (bypass parity)") {
    def pairs(withErr: Boolean): Array[(String, Double)] = {
      val errCol = if (withErr) ", absolute_error(v) AS ae" else ""
      gs.sql(
        s"""SELECT l_returnflag, avg(l_quantity) AS v$errCol
           |FROM li_cb2 GROUP BY l_returnflag ORDER BY l_returnflag
           |WITH ERROR 0.3 BEHAVIOR 'do_nothing'""".stripMargin)
        .collect().map(r => (r.getString(0), r.getDouble(1)))
    }
    // the two paths accumulate in different orders (weighted algebra vs the
    // struct aggregate) — parity up to FP noise, far tighter than the
    // reference's |diff| < 2 tolerance
    pairs(withErr = false).zip(pairs(withErr = true)).foreach {
      case ((k1, v1), (k2, v2)) =>
        assert(k1 === k2 && math.abs(v1 - v2) < 1e-9, s"$k1: $v1 vs $v2")
    }
    def sums(withErr: Boolean): Array[(String, Double)] = {
      val errCol = if (withErr) ", absolute_error(v) AS ae" else ""
      gs.sql(
        s"""SELECT l_returnflag, sum(l_quantity) AS v$errCol
           |FROM li_cb2 GROUP BY l_returnflag ORDER BY l_returnflag
           |WITH ERROR 0.3 BEHAVIOR 'do_nothing'""".stripMargin)
        .collect().map(r => (r.getString(0), r.getDouble(1)))
    }
    sums(withErr = false).zip(sums(withErr = true)).foreach {
      case ((k1, v1), (k2, v2)) =>
        assert(k1 === k2 && math.abs(v1 - v2) < 1e-6 * math.max(1.0, math.abs(v1)),
          s"$k1: $v1 vs $v2")
    }
  }

  // --- ErrorEstimateFunctionTest ENT-57 family ---------------------------------
  test("ENT-57: min/max on literals never block AQP; literal values pass through") {
    val rows = gs.sql(
      """SELECT l_returnflag, sum(l_quantity) AS x, lower_bound(x) AS lb,
        |       upper_bound(x) AS ub, max(100) AS m1, max(true) AS m2,
        |       min(true) AS m3, min(101) AS m4, max(100 + 123) AS m5
        |FROM li_cb2 GROUP BY l_returnflag
        |WITH ERROR 0.9 CONFIDENCE 0.95""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.isNullAt(2) && !r.isNullAt(3), "AQP must have applied (bounds present)")
      assert(r.getInt(4) === 100 && r.getBoolean(5) && r.getBoolean(6))
      assert(r.getInt(7) === 101 && r.getInt(8) === 223)
    }
  }

  test("ENT-57: max on a QCS column rides the sample and stays exact") {
    gs
    val r = gs.sql(
      """SELECT sum(l_quantity) AS x, lower_bound(x) AS lb, upper_bound(x) AS ub,
        |       max(l_returnflag) AS mq, min(101) AS ml
        |FROM li_cb2 WITH ERROR 0.9 CONFIDENCE 0.95""".stripMargin).collect()(0)
    assert(!r.isNullAt(1) && !r.isNullAt(2), "AQP must have applied")
    val exactMax = spark.sql("SELECT max(l_returnflag) FROM li_cb2")
      .collect()(0).getString(0)
    assert(r.getString(3) === exactMax)
    assert(r.getInt(4) === 101)
  }

  test("ENT-57: max on a non-QCS column routes to base; max on the function-QCS expression rides the sample") {
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li_cb2e")
    gs.sql("CREATE SAMPLE TABLE li_cb2e_s ON li_cb2e " +
      "OPTIONS(qcs 'round(l_quantity / 10)', fraction '0.2')")
    // max of a RAW INPUT of the function QCS is not exact on the sample —
    // the rewrite must leave this query on the base (no weight column in
    // the plan) and the value must be the exact base max
    val onBase = gs.sql(
      """SELECT sum(l_extendedprice) AS x, max(l_quantity) AS mq
        |FROM li_cb2e WITH ERROR 0.9""".stripMargin)
    assert(!onBase.queryExecution.analyzed.treeString
      .contains(org.apache.spark.sql.graft.Weightage.WeightColumn),
      "max(raw input of a function QCS) must route to base")
    val exactMax = spark.sql("SELECT max(l_quantity) FROM li_cb2e")
      .collect()(0).getDouble(0)
    assert(onBase.collect()(0).getDouble(1) === exactMax)
    // max of the STRATUM EXPRESSION ITSELF is exact (every stratum keeps a
    // row carrying its key value) — the rewrite must ride the sample
    val onSample = gs.sql(
      """SELECT sum(l_extendedprice) AS x, absolute_error(x) AS ae,
        |       max(round(l_quantity / 10)) AS mb
        |FROM li_cb2e WITH ERROR 0.9""".stripMargin)
    assert(onSample.queryExecution.analyzed.treeString
      .contains(org.apache.spark.sql.graft.Weightage.WeightColumn),
      "max(function-QCS expression) must ride the sample")
    val exactB = spark.sql("SELECT max(round(l_quantity / 10)) FROM li_cb2e")
      .collect()(0).getDouble(0)
    assert(onSample.collect()(0).getDouble(2) === exactB)
    new GraftSession(spark).dropSampleTable("li_cb2e_s")
  }

  // --- ErrorEstimateFunctionTest "Test SNAP-696" -------------------------------
  test("SNAP-696: unaliased error functions keep usable schema names under order-by-agg-limit") {
    val df = gs.sql(
      """SELECT l_returnflag, avg(l_quantity) AS x, lower_bound(x)
        |FROM li_cb2 GROUP BY l_returnflag ORDER BY avg(l_quantity) DESC
        |LIMIT 10 WITH ERROR 0.9 CONFIDENCE 0.95""".stripMargin)
    val names = df.schema.fieldNames
    assert(names(0) === "l_returnflag" && names(1) === "x")
    assert(names(2).toLowerCase.contains("lower_bound"),
      s"unaliased error fn lost its name: ${names.mkString(", ")}")
    val rows = df.collect()
    assert(rows.nonEmpty && math.abs(rows(0).getDouble(2)) > 0)
    // descending by the aggregate
    rows.sliding(2).foreach(w => assert(w(0).getDouble(1) >= w(1).getDouble(1)))
  }

  // --- CommonBugTest AQP-233/249: withError subquery dataframe + join ----------
  test("AQP-233/249: aggregated withError subquery joined and re-aggregated") {
    spark.read.parquet(s"$sf/orders.parquet").createOrReplaceTempView("ord_cb2")
    // exact pipeline
    def pipeline(trips: org.apache.spark.sql.DataFrame) = {
      val dim = spark.sql(
        "SELECT o_orderkey AS d_orderkey, o_orderpriority FROM ord_cb2")
      trips.join(dim, trips("t_orderkey") === dim("d_orderkey"), "inner")
        .filter(col("t_qty") > 5)
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("t_qty")), 4).as("total_qty"))
        .orderBy(desc("total_qty"), col("o_orderpriority"))
    }
    val exactTrips = spark.sql(
      """SELECT l_orderkey AS t_orderkey, sum(l_quantity) AS t_qty
        |FROM li_cb2 GROUP BY l_orderkey""".stripMargin)
    val expected = pipeline(exactTrips).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    // withError on the subquery dataframe (full-fraction registered sample
    // on li_cb2f keeps the estimate exact, so the whole composition matches)
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li_cb2w")
    gs.sql("CREATE SAMPLE TABLE li_cb2w_s ON li_cb2w " +
      "OPTIONS(qcs 'l_orderkey', fraction '1.0')")
    val approxTrips = gs.withError(spark.sql(
      """SELECT l_orderkey AS t_orderkey, sum(l_quantity) AS t_qty
        |FROM li_cb2w GROUP BY l_orderkey""".stripMargin), 0.9, 0.95)
    val got = pipeline(approxTrips).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(got.sameElements(expected),
      s"withError subquery pipeline diverged: ${got.toSeq} vs ${expected.toSeq}")
    new GraftSession(spark).dropSampleTable("li_cb2w_s")
  }

  // --- ErrorEstimateFunctionTest "Hashjoin Bug - 2/3" ---------------------------
  test("Hashjoin parity: WITH ERROR join answers identically under broadcast and shuffle joins") {
    gs
    spark.read.parquet(s"$sf/orders.parquet").createOrReplaceTempView("ord_cb2h")
    def run(): Array[(String, Double)] = gs.sql(
      """SELECT o_orderpriority, round(sum(l_quantity), 4) AS s,
        |       absolute_error(s) AS ae
        |FROM li_cb2 JOIN ord_cb2h ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority
        |WITH ERROR 0.9""".stripMargin).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val withBroadcast = run()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val withShuffle =
      try run() finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    assert(withBroadcast.sameElements(withShuffle),
      "estimates must not depend on the physical join strategy")
  }

  // --- CommonBugTest "incorrect sort in show method" -----------------------------
  test("ORDER BY of a WITH ERROR query is stable across shuffle-partition settings") {
    gs
    def run(): Array[(String, Double)] = gs.sql(
      """SELECT l_returnflag, round(avg(l_quantity), 6) AS a, absolute_error(a) AS ae
        |FROM li_cb2 GROUP BY l_returnflag ORDER BY a DESC, l_returnflag
        |WITH ERROR 0.9""".stripMargin).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    val base = run()
    try {
      Seq("1", "6", "17").foreach { p =>
        spark.conf.set("spark.sql.shuffle.partitions", p)
        assert(run().sameElements(base), s"sort broke at $p shuffle partitions")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }

  // --- QueryRoutingTestSuite "test query without aggregate" --------------------
  test("non-aggregate query with an error clause returns exact base rows") {
    gs
    val exact = spark.sql(
      "SELECT l_orderkey AS num FROM li_cb2 ORDER BY num LIMIT 20")
      .collect().map(_.getLong(0))
    Seq("WITH ERROR 0.95",
        "WITH ERROR 0.95 CONFIDENCE 0.95").foreach { clause =>
      val got = gs.sql(
        s"SELECT l_orderkey AS num FROM li_cb2 ORDER BY num LIMIT 20 $clause")
        .collect().map(_.getLong(0))
      assert(got.sameElements(exact),
        s"row-returning query under '$clause' must not be sampled")
    }
  }

  // --- QueryRoutingTestSuite "query on base table without sampletable" ---------
  test("WITH ERROR on a table with no registered sample runs exactly on base") {
    spark.read.parquet(s"$sf/orders.parquet").createOrReplaceTempView("ord_cb2n")
    val exact = spark.sql(
      "SELECT o_orderpriority, count(*) AS c FROM ord_cb2n " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = gs.sql(
      """SELECT o_orderpriority, count(*) AS c FROM ord_cb2n
        |GROUP BY o_orderpriority ORDER BY o_orderpriority
        |WITH ERROR 0.5""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.sameElements(exact))
  }

  // --- QueryRoutingTestSuite "test from table with alias" ----------------------
  test("WITH ERROR query through a table alias routes like the bare table") {
    gs
    val bare = gs.sql(
      """SELECT l_returnflag, round(sum(l_quantity), 4) AS s, absolute_error(s) AS ae
        |FROM li_cb2 GROUP BY l_returnflag ORDER BY l_returnflag
        |WITH ERROR 0.9""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val aliased = gs.sql(
      """SELECT t.l_returnflag, round(sum(t.l_quantity), 4) AS s, absolute_error(s) AS ae
        |FROM li_cb2 t GROUP BY t.l_returnflag ORDER BY t.l_returnflag
        |WITH ERROR 0.9""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(aliased.sameElements(bare))
  }

  // --- AbstractViewTest SNAP-3211 / SNAP-3204_1 --------------------------------
  test("SNAP-3211: view with window-over-aggregate analyzes and queries through the AQP path") {
    gs
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW cb2_item_details AS SELECT * FROM (
        |  SELECT l_returnflag, sum(l_extendedprice) AS sum_sales,
        |         avg(sum(l_extendedprice)) OVER (PARTITION BY l_returnflag) AS avg_q
        |  FROM li_cb2 GROUP BY l_returnflag) tmp1
        |WHERE avg_q > 0""".stripMargin)
    val rows = spark.sql("SELECT * FROM cb2_item_details").collect()
    assert(rows.nonEmpty)
    // the same view passes whole through the AQP parser backstop
    val viaGs = gs.sql("SELECT count(*) AS c FROM cb2_item_details")
      .collect()(0).getLong(0)
    assert(viaGs === rows.length.toLong)
  }

  test("SNAP-3204: WITH ERROR over a projection view equals the inline subquery") {
    gs
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW cb2_li_view AS " +
      "SELECT l_returnflag, l_quantity FROM li_cb2 WHERE l_linenumber < 5")
    val viaView = gs.sql(
      "SELECT count(*) AS c FROM cb2_li_view WITH ERROR")
      .collect()(0).getLong(0)
    val inline = gs.sql(
      "SELECT count(*) AS c FROM (SELECT l_returnflag, l_quantity " +
        "FROM li_cb2 WHERE l_linenumber < 5) WITH ERROR")
      .collect()(0).getLong(0)
    assert(viaView === inline)
  }

  // --- CommonBugTest "transformation on sampled relation" ---------------------
  test("a transformed sampled relation stops being a sample; re-registered aggregates round-trip") {
    gs // force sample creation
    // transform the sample (drop its weight column, add a derived one) and
    // register as a temp view: queries over it must behave as plain data
    val sampleDf = spark.table("li_cb2_s")
    val transformed = sampleDf.drop(graft.functions.weightColumn)
      .withColumn("is_heavy", col("l_quantity") > 25)
    transformed.createOrReplaceTempView("cb2_transformed")
    val n = spark.sql(
      "SELECT l_returnflag, count(*) AS c FROM cb2_transformed GROUP BY l_returnflag")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // plain counts over the transformed frame = its raw row counts
    val raw = transformed.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n === raw, "a transformed sample must aggregate as plain rows")
    // aggregating the sample into a temp view and re-reading returns the
    // same values (no second weighting pass)
    val agg = gs.sql(
      "SELECT l_returnflag, count(*) AS cnt FROM li_cb2_s GROUP BY l_returnflag")
    agg.createOrReplaceTempView("cb2_agg")
    val direct = agg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val reread = spark.sql("SELECT * FROM cb2_agg")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reread === direct)
  }

  // --- CommonBugTest "query on temp table with sample table created" ----------
  test("a WITH ERROR query over a temp view rides the sample created on that view") {
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li_cb2t")
    gs.sql("CREATE SAMPLE TABLE li_cb2t_s ON li_cb2t " +
      "OPTIONS(qcs 'l_returnflag', fraction '0.3')")
    val df = gs.sql(
      """SELECT count(*) AS x, absolute_error(x) AS ae
        |FROM li_cb2t GROUP BY l_returnflag WITH ERROR""".stripMargin)
    // routed through the sample: the weight column feeds the closed-form
    // aggregate (the decode happens inside the struct aggregate)
    assert(df.queryExecution.analyzed.treeString
      .contains(org.apache.spark.sql.graft.Weightage.WeightColumn),
      "query over the base temp view must substitute the sample")
    assert(df.collect().nonEmpty)
    new GraftSession(spark).dropSampleTable("li_cb2t_s")
  }
}
