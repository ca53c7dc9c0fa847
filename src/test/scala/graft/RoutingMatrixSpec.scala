package graft

import org.apache.spark.sql.graft.ErrorLimitExceededException
import org.scalatest.funsuite.AnyFunSuite

/**
 * Result-level routing matrix over joins, behaviors and estimator families
 * (reference `JoinQueryRoutingTestSuite`, `QueryRoutingTestSuite`,
 * `PartialQueryRoutingTestSuite`): which side of a join may ride the sample,
 * what LOCAL_OMIT emits, and how HAC behaviors compose with the bootstrap
 * estimator.
 */
class RoutingMatrixSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val gs: GraftSession = {
    val g = new GraftSession(spark)
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li_rm")
    spark.read.parquet(s"$sf/orders.parquet").createOrReplaceTempView("ord_rm")
    g
  }

  private def withSample(fraction: Double)(body: => Unit): Unit = {
    gs.sql(s"CREATE SAMPLE TABLE li_rm_s ON li_rm " +
      s"OPTIONS(qcs 'l_returnflag', fraction '$fraction')")
    try body finally gs.dropSampleTable("li_rm_s")
  }

  private def exactRevenue: Map[String, Double] = spark.sql(
    """SELECT o_orderpriority, sum(l_extendedprice) r
      |FROM li_rm JOIN ord_rm ON l_orderkey = o_orderkey GROUP BY 1""".stripMargin)
    .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("inner join with a non-full sample: estimates near truth, CI sane") {
    withSample(0.3) {
      val rows = gs.sql(
        """SELECT o_orderpriority, sum(l_extendedprice) AS r,
          |       absolute_error(r) AS ae
          |FROM li_rm JOIN ord_rm ON l_orderkey = o_orderkey
          |GROUP BY o_orderpriority WITH ERROR 0.9""".stripMargin).collect()
      val truth = exactRevenue
      assert(rows.length === truth.size)
      rows.foreach { r =>
        assert(r.getDouble(2) > 0.0, "a 0.3 sample must carry error")
        val t = truth(r.getString(0))
        assert(math.abs(r.getDouble(1) - t) / t < 0.35,
          s"${r.getString(0)}: ${r.getDouble(1)} vs $t")
      }
    }
  }

  test("left outer join: sampled left (fact) side is substituted, estimates near truth") {
    withSample(1.0) {
      val rows = gs.sql(
        """SELECT l_returnflag, sum(l_extendedprice) AS r, absolute_error(r) AS ae
          |FROM li_rm LEFT OUTER JOIN ord_rm ON l_orderkey = o_orderkey
          |GROUP BY l_returnflag ORDER BY l_returnflag
          |WITH ERROR 0.9""".stripMargin).collect()
      val truth = spark.sql(
        """SELECT l_returnflag, sum(l_extendedprice) r
          |FROM li_rm LEFT OUTER JOIN ord_rm ON l_orderkey = o_orderkey
          |GROUP BY 1 ORDER BY 1""".stripMargin).collect()
      rows.zip(truth).foreach { case (a, x) =>
        assert(math.abs(a.getDouble(1) - x.getDouble(1)) < 1e-6)
        assert(a.getDouble(2) === 0.0) // full fraction: exact with zero error
      }
    }
  }

  test("right outer join protecting the sampled left side: exact base results") {
    // RightOuter protects its LEFT child (the fact table here) from
    // substitution — the query must run exactly on base, error ≡ 0
    withSample(0.2) {
      val rows = gs.sql(
        """SELECT o_orderpriority, sum(l_extendedprice) AS r, absolute_error(r) AS ae
          |FROM li_rm RIGHT OUTER JOIN ord_rm ON l_orderkey = o_orderkey
          |GROUP BY o_orderpriority ORDER BY o_orderpriority
          |WITH ERROR 0.9""".stripMargin).collect()
      val truth = spark.sql(
        """SELECT o_orderpriority, sum(l_extendedprice) r
          |FROM li_rm RIGHT OUTER JOIN ord_rm ON l_orderkey = o_orderkey
          |GROUP BY 1 ORDER BY 1""".stripMargin).collect()
      rows.zip(truth).foreach { case (a, x) =>
        val t = x.get(1)
        if (t == null) assert(a.get(1) == null)
        else assert(math.abs(a.getDouble(1) - x.getDouble(1)) < 1e-6)
        assert(a.getDouble(2) === 0.0, "protected join must not be approximated")
      }
    }
  }

  test("left semi join: exact (sample substitution fenced)") {
    withSample(0.2) {
      val got = gs.sql(
        """SELECT l_returnflag, sum(l_quantity) AS s, absolute_error(s) AS ae
          |FROM li_rm LEFT SEMI JOIN ord_rm ON l_orderkey = o_orderkey
          |GROUP BY l_returnflag ORDER BY l_returnflag
          |WITH ERROR 0.9""".stripMargin).collect()
      val want = spark.sql(
        """SELECT l_returnflag, sum(l_quantity) s
          |FROM li_rm LEFT SEMI JOIN ord_rm ON l_orderkey = o_orderkey
          |GROUP BY 1 ORDER BY 1""".stripMargin).collect()
      got.zip(want).foreach { case (a, x) =>
        assert(a.getDouble(1) === x.getDouble(1))
        assert(a.getDouble(2) === 0.0)
      }
    }
  }

  test("local_omit: failing groups emit NULL estimates, passing groups survive") {
    withSample(0.05) {
      val rows = gs.sql(
        """SELECT l_returnflag, sum(l_quantity) AS s
          |FROM li_rm GROUP BY l_returnflag
          |WITH ERROR 0.0000001 BEHAVIOR 'local_omit'""".stripMargin).collect()
      // impossible limit on a 5% sample: every group fails → all NULL
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.isNullAt(1),
        s"${r.getString(0)} should be omitted, got ${r.get(1)}"))
      val loose = gs.sql(
        """SELECT l_returnflag, sum(l_quantity) AS s
          |FROM li_rm GROUP BY l_returnflag
          |WITH ERROR 0.99 BEHAVIOR 'local_omit'""".stripMargin).collect()
      loose.foreach(r => assert(!r.isNullAt(1)))
    }
  }

  test("HAC behaviors compose with the bootstrap estimator") {
    withSample(0.05) {
      spark.conf.set("spark.sql.aqp.estimator", "bootstrap")
      try {
        // reroute: exact base answer regardless of estimator family
        val rer = gs.sql(
          """SELECT l_returnflag, sum(l_quantity) AS s FROM li_rm
            |GROUP BY l_returnflag ORDER BY l_returnflag
            |WITH ERROR 0.0000001 BEHAVIOR 'run_on_full_table'""".stripMargin)
          .collect()
        val truth = spark.sql(
          """SELECT l_returnflag, sum(l_quantity) s FROM li_rm
            |GROUP BY 1 ORDER BY 1""".stripMargin).collect()
        rer.zip(truth).foreach { case (a, x) =>
          assert(a.getDouble(1) === x.getDouble(1))
        }
        // strict with a loose limit passes and stays approximate
        val ok = gs.sql(
          """SELECT l_returnflag, sum(l_quantity) AS s FROM li_rm
            |GROUP BY l_returnflag WITH ERROR 0.99 BEHAVIOR 'strict'""".stripMargin)
          .collect()
        assert(ok.nonEmpty)
        // strict with an impossible limit throws executor-side
        intercept[Exception] {
          gs.sql(
            """SELECT l_returnflag, sum(l_quantity) AS s FROM li_rm
              |GROUP BY l_returnflag
              |WITH ERROR 0.0000001 BEHAVIOR 'strict'""".stripMargin).collect()
        }
      } finally spark.conf.set("spark.sql.aqp.estimator", "closedform")
    }
  }

  test("partial routing on a join query: every group present, failing groups exact") {
    withSample(0.05) {
      val rows = gs.sql(
        """SELECT o_orderpriority, sum(l_extendedprice) AS r
          |FROM li_rm JOIN ord_rm ON l_orderkey = o_orderkey
          |GROUP BY o_orderpriority ORDER BY o_orderpriority
          |WITH ERROR 0.0000001 BEHAVIOR 'partial_run_on_base_table'""".stripMargin)
        .collect()
      val truth = exactRevenue
      assert(rows.length === truth.size)
      // impossible limit ⇒ all groups rerouted ⇒ all exact
      rows.foreach { r =>
        assert(math.abs(r.getDouble(1) - truth(r.getString(0))) < 1e-6,
          s"${r.getString(0)}: ${r.getDouble(1)} vs ${truth(r.getString(0))}")
      }
    }
  }

  // ---------------------------------------------------------------------------
  // Reference scenario matrix (JoinQueryRoutingTestSuite 994 LoC +
  // PartialQueryRoutingTestSuite 1319 LoC), ported per-behavior with
  // routed-vs-sampled PLAN asserts, not just result asserts.
  // ---------------------------------------------------------------------------

  private lazy val cust: Unit =
    spark.read.parquet(s"$sf/customer.parquet").createOrReplaceTempView("cust_rm")

  /** Whether the analyzed plan rides the sample (weight decode present). */
  private def sampled(sql: String): (Array[org.apache.spark.sql.Row], Boolean) = {
    val df = gs.sql(sql)
    (df.collect(), df.queryExecution.analyzed.treeString.contains("mapcolumntoweight"))
  }

  test("join routing: sampled fact on the right side of the join routes too") {
    withSample(1.0) {
      val (rows, viaSample) = sampled(
        """SELECT o_orderpriority, sum(l_extendedprice) AS r
          |FROM ord_rm JOIN li_rm ON o_orderkey = l_orderkey
          |GROUP BY 1 ORDER BY 1 WITH ERROR 0.9""".stripMargin)
      assert(viaSample, "fact side on the right must still substitute")
      val truth = exactRevenue
      rows.foreach(r => assert(math.abs(r.getDouble(1) - truth(r.getString(0))) < 1e-6))
    }
  }

  test("join routing: sample as the broadcast build side") {
    // sample over the SMALL side (orders): substitution must survive the
    // planner choosing it as a BroadcastHashJoin build side (reference
    // 'join of one sample table with another base table')
    gs.sql("CREATE SAMPLE TABLE ord_rm_s ON ord_rm " +
      "OPTIONS(qcs 'o_orderpriority', fraction '1.0')")
    try {
      val df = gs.sql(
        """SELECT o_orderpriority, sum(o_totalprice) AS s
          |FROM li_rm JOIN ord_rm ON l_orderkey = o_orderkey
          |GROUP BY 1 ORDER BY 1 WITH ERROR 0.9""".stripMargin)
      assert(df.queryExecution.analyzed.treeString.contains("mapcolumntoweight"))
      val phys = df.queryExecution.executedPlan.toString
      assert(phys.contains("BroadcastHashJoin"),
        s"small sampled side should broadcast:\n$phys")
      val truth = spark.sql(
        """SELECT o_orderpriority, sum(o_totalprice) s
          |FROM li_rm JOIN ord_rm ON l_orderkey = o_orderkey GROUP BY 1""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      df.collect().foreach(r =>
        assert(math.abs(r.getDouble(1) - truth(r.getString(0))) < 1e-6))
    } finally gs.dropSampleTable("ord_rm_s")
  }

  test("join routing: three-table chain routes through the sampled fact") {
    cust
    withSample(1.0) {
      val (rows, viaSample) = sampled(
        """SELECT c_mktsegment, sum(l_extendedprice) AS r
          |FROM li_rm JOIN ord_rm ON l_orderkey = o_orderkey
          |           JOIN cust_rm ON o_custkey = c_custkey
          |GROUP BY 1 ORDER BY 1 WITH ERROR 0.9""".stripMargin)
      assert(viaSample, "three-table chain must still substitute the fact scan")
      val truth = spark.sql(
        """SELECT c_mktsegment, sum(l_extendedprice) r
          |FROM li_rm JOIN ord_rm ON l_orderkey = o_orderkey
          |           JOIN cust_rm ON o_custkey = c_custkey
          |GROUP BY 1""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(rows.length === truth.size)
      rows.foreach(r => assert(math.abs(r.getDouble(1) - truth(r.getString(0))) < 1e-6))
    }
  }

  test("join routing: distinct aggregate over a join routes to base") {
    withSample(0.3) {
      val (rows, viaSample) = sampled(
        """SELECT o_orderpriority, count(DISTINCT l_suppkey) AS d
          |FROM li_rm JOIN ord_rm ON l_orderkey = o_orderkey
          |GROUP BY 1 ORDER BY 1 WITH ERROR 0.9""".stripMargin)
      assert(!viaSample, "distinct agg cannot ride a sample")
      val truth = spark.sql(
        """SELECT o_orderpriority, count(DISTINCT l_suppkey) d
          |FROM li_rm JOIN ord_rm ON l_orderkey = o_orderkey GROUP BY 1""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      rows.foreach(r => assert(r.getLong(1) === truth(r.getString(0))))
    }
  }

  test("join routing: sample on the null-producing side of LEFT OUTER is fenced") {
    // mirror of ENT-61: ord LEFT JOIN li with the sample on li (the inner,
    // null-producing side) must NOT substitute — outer-join semantics over a
    // sample would fabricate/lose null rows
    withSample(1.0) {
      val (rows, viaSample) = sampled(
        """SELECT o_orderpriority, sum(l_extendedprice) AS r
          |FROM ord_rm LEFT OUTER JOIN li_rm ON o_orderkey = l_orderkey
          |GROUP BY 1 ORDER BY 1 WITH ERROR 0.9""".stripMargin)
      assert(!viaSample, "null-producing side must be protected")
      val truth = spark.sql(
        """SELECT o_orderpriority, sum(l_extendedprice) r
          |FROM ord_rm LEFT OUTER JOIN li_rm ON o_orderkey = l_orderkey
          |GROUP BY 1""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      rows.foreach(r => assert(math.abs(r.getDouble(1) - truth(r.getString(0))) < 1e-6))
    }
  }

  test("join routing: RIGHT OUTER with the sample on the preserved right side") {
    withSample(1.0) {
      val (rows, viaSample) = sampled(
        """SELECT o_orderpriority, sum(l_extendedprice) AS r
          |FROM ord_rm RIGHT OUTER JOIN li_rm ON o_orderkey = l_orderkey
          |GROUP BY 1 ORDER BY 1 WITH ERROR 0.9""".stripMargin)
      assert(viaSample, "preserved side may ride the sample")
      val truth = spark.sql(
        """SELECT o_orderpriority, sum(l_extendedprice) r
          |FROM ord_rm RIGHT OUTER JOIN li_rm ON o_orderkey = l_orderkey
          |GROUP BY 1""".stripMargin)
        .collect().map(r =>
          (if (r.isNullAt(0)) null else r.getString(0)) -> r.getDouble(1)).toMap
      rows.foreach { r =>
        val k = if (r.isNullAt(0)) null else r.getString(0)
        assert(math.abs(r.getDouble(1) - truth(k)) < 1e-6)
      }
    }
  }

  test("join routing: FULL OUTER join is never substituted") {
    withSample(1.0) {
      val (_, viaSample) = sampled(
        """SELECT o_orderpriority, sum(l_extendedprice) AS r
          |FROM ord_rm FULL OUTER JOIN li_rm ON o_orderkey = l_orderkey
          |GROUP BY 1 WITH ERROR 0.9""".stripMargin)
      assert(!viaSample, "full outer join must never be approximated")
    }
  }

  test("join routing: LEFT ANTI join is fenced") {
    withSample(1.0) {
      val (rows, viaSample) = sampled(
        """SELECT l_returnflag, sum(l_quantity) AS s
          |FROM li_rm LEFT ANTI JOIN ord_rm
          |  ON l_orderkey = o_orderkey AND o_totalprice > 100000
          |GROUP BY 1 ORDER BY 1 WITH ERROR 0.9""".stripMargin)
      assert(!viaSample, "anti join must be exact")
      val truth = spark.sql(
        """SELECT l_returnflag, sum(l_quantity) s
          |FROM li_rm LEFT ANTI JOIN ord_rm
          |  ON l_orderkey = o_orderkey AND o_totalprice > 100000
          |GROUP BY 1""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      rows.foreach(r => assert(r.getDouble(1) === truth(r.getString(0))))
    }
  }

  test("join routing: two sample views joined WITHOUT an aggregate execute plainly") {
    // reference 'join of two sample tables without aggregate': a scan-level
    // join of sample views is ordinary SQL — no rewrite, no error
    gs.sql("CREATE SAMPLE TABLE li_rm_s1 ON li_rm " +
      "OPTIONS(qcs 'l_returnflag', fraction '1.0')")
    gs.sql("CREATE SAMPLE TABLE ord_rm_s1 ON ord_rm " +
      "OPTIONS(qcs 'o_orderpriority', fraction '1.0')")
    try {
      val n = gs.sql(
        """SELECT li_rm_s1.l_orderkey FROM li_rm_s1
          |JOIN ord_rm_s1 ON l_orderkey = o_orderkey""".stripMargin).count()
      assert(n > 0)
    } finally {
      gs.dropSampleTable("li_rm_s1"); gs.dropSampleTable("ord_rm_s1")
    }
  }

  test("join routing: samples registered on BOTH bases substitute exactly one") {
    // joining the two sample VIEWS directly is rejected (SubQueryRoutingSpec
    // pins the reference's 'Join between two sample tables' error); when
    // samples are merely REGISTERED on both base tables, the rewrite must
    // pick one side and stay correct — never substitute both
    gs.sql("CREATE SAMPLE TABLE li_rm_s2 ON li_rm " +
      "OPTIONS(qcs 'l_returnflag', fraction '1.0')")
    gs.sql("CREATE SAMPLE TABLE ord_rm_s2 ON ord_rm " +
      "OPTIONS(qcs 'o_orderpriority', fraction '1.0')")
    try {
      val df = gs.sql(
        """SELECT o_orderpriority, sum(l_extendedprice) AS r
          |FROM li_rm JOIN ord_rm ON l_orderkey = o_orderkey
          |GROUP BY 1 ORDER BY 1 WITH ERROR 0.9""".stripMargin)
      val plan = df.queryExecution.analyzed.treeString
      assert(plan.contains("mapcolumntoweight"))
      // exactly one weight column decoded — two would square the weights
      val weightScans = plan.split("\n")
        .count(_.contains("snappy_sampler_weightage#"))
      val truth = exactRevenue
      df.collect().foreach(r =>
        assert(math.abs(r.getDouble(1) - truth(r.getString(0))) < 1e-6,
          s"one-sample substitution broke (weight cols in $weightScans lines)"))
    } finally {
      gs.dropSampleTable("li_rm_s2"); gs.dropSampleTable("ord_rm_s2")
    }
  }

  test("partial routing: sort + limit above the partial union hold") {
    withSample(0.05) {
      val rows = gs.sql(
        """SELECT o_orderpriority, sum(l_extendedprice) AS r
          |FROM li_rm JOIN ord_rm ON l_orderkey = o_orderkey
          |GROUP BY 1 ORDER BY r DESC LIMIT 3
          |WITH ERROR 0.0000001 BEHAVIOR 'partial_run_on_base_table'""".stripMargin)
        .collect()
      val truth = exactRevenue.toSeq.sortBy(-_._2).take(3)
      assert(rows.length === 3)
      rows.zip(truth).foreach { case (r, (k, v)) =>
        assert(r.getString(0) === k, "ordering above the union broke")
        assert(math.abs(r.getDouble(1) - v) < 1e-6)
      }
    }
  }

  test("partial routing: global aggregate (no GROUP BY) reroutes exactly") {
    withSample(0.05) {
      val row = gs.sql(
        """SELECT sum(l_extendedprice) AS r, count(*) AS c FROM li_rm
          |WITH ERROR 0.0000001 BEHAVIOR 'partial_run_on_base_table'""".stripMargin)
        .collect()(0)
      val want = spark.sql("SELECT sum(l_extendedprice) r, count(*) c FROM li_rm")
        .collect()(0)
      assert(math.abs(row.getDouble(0) - want.getDouble(0)) < 1e-6)
      assert(row.getLong(1) === want.getLong(1))
    }
  }

  test("partial routing: float and decimal measures reroute exactly") {
    withSample(0.05) {
      // reference runs the partial matrix per numeric type (decimal, float,
      // double) — the union of sampled and base partial results must not
      // change the column type or lose precision
      val rows = gs.sql(
        """SELECT l_returnflag, sum(CAST(l_quantity AS float)) AS fs,
          |       sum(CAST(l_extendedprice AS decimal(18,2))) AS ds
          |FROM li_rm GROUP BY 1 ORDER BY 1
          |WITH ERROR 0.0000001 BEHAVIOR 'partial_run_on_base_table'""".stripMargin)
        .collect()
      val want = spark.sql(
        """SELECT l_returnflag, sum(CAST(l_quantity AS float)) fs,
          |       sum(CAST(l_extendedprice AS decimal(18,2))) ds
          |FROM li_rm GROUP BY 1 ORDER BY 1""".stripMargin).collect()
      rows.zip(want).foreach { case (a, x) =>
        assert(a.getString(0) === x.getString(0))
        assert(math.abs(a.getDouble(1) - x.getDouble(1)) < 1e-3)
        assert((BigDecimal(a.getDecimal(2)) - BigDecimal(x.getDecimal(2))).abs
          < BigDecimal("0.01"))
      }
    }
  }

  test("routing: WHERE on the same column as GROUP BY rides the sample") {
    withSample(1.0) {
      val (rows, viaSample) = sampled(
        """SELECT l_returnflag, sum(l_quantity) AS s FROM li_rm
          |WHERE l_returnflag = 'A' GROUP BY 1 WITH ERROR 0.9""".stripMargin)
      assert(viaSample)
      val want = spark.sql(
        "SELECT sum(l_quantity) FROM li_rm WHERE l_returnflag = 'A'")
        .collect()(0).getDouble(0)
      assert(rows.length === 1 && math.abs(rows(0).getDouble(1) - want) < 1e-6)
    }
  }

  test("routing: ORDER BY on the error column (AQP-201)") {
    withSample(0.3) {
      val rows = gs.sql(
        """SELECT l_returnflag, sum(l_quantity) AS s,
          |       absolute_error(s) AS ae
          |FROM li_rm GROUP BY 1 ORDER BY ae DESC, l_returnflag
          |WITH ERROR 0.9""".stripMargin).collect()
      assert(rows.length === 3)
      val errs = rows.map(_.getDouble(2))
      assert(errs.sorted.reverse.toSeq === errs.toSeq, "not sorted by error")
    }
  }

  test("routing: bootstrap estimator over a join (group-by bootstrap)") {
    withSample(1.0) {
      spark.conf.set("spark.sql.aqp.estimator", "bootstrap")
      try {
        val (rows, viaSample) = sampled(
          """SELECT o_orderpriority, sum(l_extendedprice) AS r
            |FROM li_rm JOIN ord_rm ON l_orderkey = o_orderkey
            |GROUP BY 1 ORDER BY 1 WITH ERROR 0.9""".stripMargin)
        assert(viaSample)
        val truth = exactRevenue
        // bootstrap point estimate at full fraction = the HT estimate = exact
        rows.foreach(r =>
          assert(math.abs(r.getDouble(1) - truth(r.getString(0))) < 1e-6))
      } finally spark.conf.set("spark.sql.aqp.estimator", "closedform")
    }
  }

  test("join routing: comma-join syntax, results invariant to join strategy") {
    // reference `ErrorEstimateFunctionTest` "Hashjoin Bug - 2/3": old-style
    // comma joins route like explicit JOINs, and the weighted estimates
    // must be identical whichever physical join strategy the planner picks
    withSample(0.3) {
      val q =
        """SELECT count(*) AS c, round(sum(l_extendedprice), 4) AS s
          |FROM li_rm t1, ord_rm t2 WHERE t1.l_orderkey = t2.o_orderkey
          |WITH ERROR 0.9""".stripMargin
      val broadcast = gs.sql(q).collect()(0)
      assert(broadcast.getLong(0) > 0L)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val shuffled = gs.sql(q).collect()(0)
        assert(shuffled.getLong(0) === broadcast.getLong(0),
          "weighted count must not depend on the join strategy")
        assert(shuffled.getDouble(1) === broadcast.getDouble(1),
          "weighted sum must not depend on the join strategy")
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      // and the comma join actually rode the sample
      val (_, viaSample) = sampled(q)
      assert(viaSample, "comma-join must substitute the sample like explicit JOIN")
    }
  }

  test("SNAP-3236: aliased DataFrame aggregate + auto-named sort + limit under reroutes") {
    // reference CommonBugTest "No plan for SubqueryAlias": the DataFrame API
    // inserts a SubqueryAlias between the aggregate and the error contract,
    // sorts on Spark's auto-generated aggregate name, and limits — under
    // both full-table and partial reroutes
    withSample(0.3) {
      val exact = spark.table("li_rm")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(Map("l_quantity" -> "sum"))
        .sort(org.apache.spark.sql.functions.col("sum(l_quantity)").desc)
        .limit(5).collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      for (b <- Seq("run_on_full_table", "partial_run_on_base_table")) {
        val df = spark.table("li_rm")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(Map("l_quantity" -> "sum")).alias("total")
          .sort(org.apache.spark.sql.functions.col("sum(l_quantity)").desc)
          .limit(5)
        // impossibly tight limit -> every group reroutes to exact
        val got = gs.withError(df, error = 1e-7, behavior = b).collect()
          .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        assert(got.toSeq === exact.toSeq, s"[$b]")
      }
    }
  }

  test("routing: min/max outside the QCS route to base, inside stay sampled") {
    withSample(1.0) { // qcs is l_returnflag
      val (_, viaMin) = sampled(
        """SELECT l_returnflag, min(l_shipdate) AS m, sum(l_quantity) AS s
          |FROM li_rm GROUP BY 1 WITH ERROR 0.9""".stripMargin)
      assert(!viaMin, "min over a non-QCS column must route to base")
      val (_, viaQcs) = sampled(
        """SELECT l_returnflag, max(l_returnflag) AS m, sum(l_quantity) AS s
          |FROM li_rm GROUP BY 1 WITH ERROR 0.9""".stripMargin)
      assert(viaQcs, "min/max over QCS columns may ride the sample")
    }
  }
}
