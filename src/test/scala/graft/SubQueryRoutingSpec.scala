package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Subquery fencing for the AQP rewrite, mirroring the reference's
 * `SubQueryRoutingTestSuite` (`/root/reference/src/test/scala/io/snappydata/
 * core/aqp/SubQueryRoutingTestSuite.scala`): expression subqueries (scalar /
 * IN / EXISTS) stay exact, the error contract binds to the aggregate above
 * the sampled scan (not blindly the lowest aggregate in the tree), WITH
 * ERROR works inside a FROM-clause derived table, and joining two different
 * sample tables is rejected with the reference's error.
 */
class SubQueryRoutingSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val gs: GraftSession = {
    val g = new GraftSession(spark)
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("sq_lineitem")
    spark.read.parquet(s"$sf/orders.parquet").createOrReplaceTempView("sq_orders")
    g
  }

  private def withFullSample(qcs: String = "l_returnflag")(body: => Unit): Unit = {
    gs.sql(s"CREATE SAMPLE TABLE sq_li_sample ON sq_lineitem " +
      s"OPTIONS(qcs '$qcs', fraction '1.0')")
    try body finally gs.dropSampleTable("sq_li_sample")
  }

  test("scalar subquery with its own aggregate stays exact; outer agg approximated") {
    withFullSample() {
      val approx = gs.sql(
        """SELECT l_returnflag, sum(l_quantity) AS s, absolute_error(s) AS e
          |FROM sq_lineitem
          |WHERE l_quantity > (SELECT avg(l_quantity) FROM sq_lineitem)
          |GROUP BY l_returnflag ORDER BY l_returnflag
          |WITH ERROR 0.9""".stripMargin).collect()
      val exact = spark.sql(
        """SELECT l_returnflag, sum(l_quantity) AS s
          |FROM sq_lineitem
          |WHERE l_quantity > (SELECT avg(l_quantity) FROM sq_lineitem)
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin).collect()
      assert(approx.length === exact.length)
      approx.zip(exact).foreach { case (a, x) =>
        assert(a.getString(0) === x.getString(0))
        assert(math.abs(a.getDouble(1) - x.getDouble(1)) < 1e-6)
        assert(a.getDouble(2) === 0.0) // full fraction ⇒ zero error
      }
    }
  }

  test("IN subquery on another table stays exact; outer query uses the sample") {
    withFullSample() {
      val approx = gs.sql(
        """SELECT l_returnflag, sum(l_quantity) AS s
          |FROM sq_lineitem
          |WHERE l_orderkey IN
          |  (SELECT o_orderkey FROM sq_orders WHERE o_custkey % 3 = 0)
          |GROUP BY l_returnflag ORDER BY l_returnflag
          |WITH ERROR 0.9""".stripMargin).collect()
      val exact = spark.sql(
        """SELECT l_returnflag, sum(l_quantity) AS s
          |FROM sq_lineitem
          |WHERE l_orderkey IN
          |  (SELECT o_orderkey FROM sq_orders WHERE o_custkey % 3 = 0)
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin).collect()
      assert(approx.length === exact.length)
      approx.zip(exact).foreach { case (a, x) =>
        assert(math.abs(a.getDouble(1) - x.getDouble(1)) < 1e-6)
      }
    }
  }

  test("EXISTS correlated subquery stays exact; outer query uses the sample") {
    withFullSample() {
      val approx = gs.sql(
        """SELECT l_returnflag, count(*) AS c
          |FROM sq_lineitem
          |WHERE EXISTS (SELECT 1 FROM sq_orders
          |              WHERE o_orderkey = l_orderkey AND o_custkey % 2 = 0)
          |GROUP BY l_returnflag ORDER BY l_returnflag
          |WITH ERROR 0.9""".stripMargin).collect()
      val exact = spark.sql(
        """SELECT l_returnflag, count(*) AS c
          |FROM sq_lineitem
          |WHERE EXISTS (SELECT 1 FROM sq_orders
          |              WHERE o_orderkey = l_orderkey AND o_custkey % 2 = 0)
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin).collect()
      assert(approx.length === exact.length)
      approx.zip(exact).foreach { case (a, x) =>
        assert(a.getLong(1) === x.getLong(1))
      }
    }
  }

  test("WITH ERROR inside a FROM-clause derived table (reference test 3)") {
    withFullSample() {
      val inner = gs.sql(
        """SELECT s, ae FROM (
          |  SELECT sum(l_quantity) AS s, absolute_error(s) AS ae
          |  FROM sq_lineitem GROUP BY l_returnflag
          |  WITH ERROR 0.9 CONFIDENCE 0.95
          |) AS subT ORDER BY s""".stripMargin).collect()
      val flat = gs.sql(
        """SELECT sum(l_quantity) AS s, absolute_error(s) AS ae
          |FROM sq_lineitem GROUP BY l_returnflag
          |ORDER BY s
          |WITH ERROR 0.9 CONFIDENCE 0.95""".stripMargin).collect()
      assert(inner.length === flat.length)
      inner.zip(flat).foreach { case (i, f) =>
        assert(math.abs(i.getDouble(0) - f.getDouble(0)) < 1e-6)
        assert(i.getDouble(1) === f.getDouble(1))
      }
    }
  }

  test("derived-table aggregate over the sample + outer re-aggregation") {
    withFullSample() {
      val approx = gs.sql(
        """SELECT max(s) AS mx FROM (
          |  SELECT l_returnflag, sum(l_quantity) AS s
          |  FROM sq_lineitem GROUP BY l_returnflag
          |) AS t
          |WITH ERROR 0.9""".stripMargin).collect()(0).getDouble(0)
      val exact = spark.sql(
        """SELECT max(s) FROM (
          |  SELECT l_returnflag, sum(l_quantity) AS s
          |  FROM sq_lineitem GROUP BY l_returnflag
          |) AS t""".stripMargin).collect()(0).getDouble(0)
      assert(math.abs(approx - exact) < 1e-6)
    }
  }

  test("'with error' inside a string literal is NOT treated as an AQP clause") {
    val n = gs.sql(
      "SELECT count(*) AS c FROM sq_lineitem " +
        "WHERE l_returnflag IN ('failed with error )', 'retry with error )')")
      .collect()(0).getLong(0)
    assert(n === 0L) // parses and runs as plain SQL, literals untouched
  }

  test("two WITH ERROR clauses are rejected") {
    withFullSample() {
      intercept[UnsupportedOperationException] {
        gs.sql(
          """SELECT s FROM (
            |  SELECT sum(l_quantity) AS s FROM sq_lineitem WITH ERROR 0.5
            |) AS t
            |WITH ERROR 0.5""".stripMargin)
      }
    }
  }

  test("join between two different sample tables is rejected") {
    gs.sql("CREATE SAMPLE TABLE sq_li_s ON sq_lineitem " +
      "OPTIONS(qcs 'l_returnflag', fraction '0.5')")
    gs.sql("CREATE SAMPLE TABLE sq_or_s ON sq_orders " +
      "OPTIONS(qcs 'o_orderpriority', fraction '0.5')")
    try {
      val ex = intercept[UnsupportedOperationException] {
        gs.sql(
          """SELECT sum(l_quantity) AS s
            |FROM sq_li_s JOIN sq_or_s ON l_orderkey = o_orderkey
            |WITH ERROR 0.5""".stripMargin)
      }
      assert(ex.getMessage.contains("Join between two sample tables"))
    } finally {
      gs.dropSampleTable("sq_li_s")
      gs.dropSampleTable("sq_or_s")
    }
  }

  test("self-join of one sample table is allowed") {
    gs.sql("CREATE SAMPLE TABLE sq_li_self ON sq_lineitem " +
      "OPTIONS(qcs 'l_returnflag', fraction '1.0')")
    try {
      val n = gs.sql(
        """SELECT count(*) AS c
          |FROM sq_li_self a JOIN sq_li_self b
          |  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
          |WITH ERROR 0.5""".stripMargin).collect()(0).getLong(0)
      assert(n > 0)
    } finally gs.dropSampleTable("sq_li_self")
  }

  test("AQP-231/233: a WITH ERROR result in a temp view / DataFrame joins consistently") {
    // reference CommonBugTest "Sample Table subquery in a temp table and
    // then joined" / "subquery dataframe and join": the rewritten plan
    // (error aggregates already bound) embeds into a later query — the
    // rewrite must not fire again on it, and the joined values must equal
    // the standalone result
    withFullSample() {
      val aqp = gs.sql(
        """SELECT l_returnflag AS rf, round(sum(l_quantity), 4) AS s,
          |       round(absolute_error(s), 6) AS ae
          |FROM sq_lineitem GROUP BY 1 WITH ERROR 0.9""".stripMargin)
      val standalone = aqp.collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      aqp.createOrReplaceTempView("aqp_res_231")
      try {
        // temp-view join through SQL
        val joined = gs.sql(
          """SELECT a.rf, a.s, a.ae, n.cnt
            |FROM aqp_res_231 a
            |JOIN (SELECT l_returnflag AS rf2, count(*) AS cnt
            |      FROM sq_lineitem GROUP BY 1) n ON a.rf = n.rf2
            |ORDER BY a.rf""".stripMargin).collect()
        assert(joined.length === standalone.size)
        joined.foreach { r =>
          val (s, ae) = standalone(r.getString(0))
          assert(r.getDouble(1) === s)
          assert(r.getDouble(2) === ae)
          assert(r.getLong(3) > 0)
        }
        // DataFrame-API join of the same result frame
        val counts = spark.table("sq_lineitem")
          .groupBy(org.apache.spark.sql.functions.col("l_returnflag").as("rf"))
          .count()
        val dfJoined = aqp.join(counts, "rf").collect()
        assert(dfJoined.length === standalone.size)
        dfJoined.foreach(r => assert(r.getDouble(1) === standalone(r.getString(0))._1))
      } finally spark.catalog.dropTempView("aqp_res_231")
    }
  }

  test("AQP-224: derived aggregate over the sampled base joined + re-aggregated") {
    // trailing WITH ERROR binds to the LOWEST aggregate above the sampled
    // scan — the derived table's — while the outer aggregate over the join
    // runs exact arithmetic on the (approximate) inner results
    withFullSample("l_returnflag") {
      def q(withError: String) = gs.sql(
        s"""SELECT t.l_returnflag, round(sum(o.o_totalprice), 2) AS income
           |FROM (SELECT l_returnflag, l_orderkey, sum(l_quantity) AS daily
           |      FROM sq_lineitem GROUP BY l_returnflag, l_orderkey) t
           |JOIN sq_orders o ON t.l_orderkey = o.o_orderkey
           |WHERE t.daily > 10
           |GROUP BY t.l_returnflag ORDER BY t.l_returnflag $withError""".stripMargin)
      val approx = q("WITH ERROR 0.9")
      assert(approx.queryExecution.analyzed.treeString
        .contains(org.apache.spark.sql.graft.Weightage.WeightColumn),
        "inner derived aggregate must ride the sample")
      val a = approx.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      val x = q("").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(a === x, "full-fraction sample must reproduce the exact join result")
    }
  }

  test("AQP-247: join of two limited aggregate subqueries, one sampled base") {
    withFullSample("l_returnflag") {
      val df = gs.sql(
        """SELECT t.l_returnflag, t.qty, e.revenue
          |FROM (SELECT l_returnflag, sum(l_quantity) AS qty
          |      FROM sq_lineitem GROUP BY 1 ORDER BY qty DESC LIMIT 10) t
          |JOIN (SELECT o_orderpriority AS p, sum(o_totalprice) AS revenue,
          |             substr(o_orderpriority, 1, 1) AS l_returnflag_like
          |      FROM sq_orders GROUP BY o_orderpriority
          |      ORDER BY revenue DESC LIMIT 10) e
          |  ON length(t.l_returnflag) = length(e.l_returnflag_like)
          |ORDER BY t.l_returnflag, e.revenue DESC
          |WITH ERROR 0.9""".stripMargin)
      // the contract binds to the sampled side's subquery aggregate; the
      // orders-side subquery (no sample) runs exact
      val rows = df.collect()
      assert(rows.nonEmpty)
      val want = spark.sql(
        """SELECT t.l_returnflag, t.qty, e.revenue
          |FROM (SELECT l_returnflag, sum(l_quantity) AS qty
          |      FROM sq_lineitem GROUP BY 1 ORDER BY qty DESC LIMIT 10) t
          |JOIN (SELECT o_orderpriority AS p, sum(o_totalprice) AS revenue,
          |             substr(o_orderpriority, 1, 1) AS l_returnflag_like
          |      FROM sq_orders GROUP BY o_orderpriority
          |      ORDER BY revenue DESC LIMIT 10) e
          |  ON length(t.l_returnflag) = length(e.l_returnflag_like)
          |ORDER BY t.l_returnflag, e.revenue DESC""".stripMargin).collect()
      assert(rows.map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq ===
        want.map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq)
    }
  }
}
