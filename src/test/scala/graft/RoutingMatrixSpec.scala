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
}
