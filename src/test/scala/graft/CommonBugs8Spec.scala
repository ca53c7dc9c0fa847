package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * Round-9 second tranche: the DataFrame-API edge scenarios from the
 * reference's `AbstractAQPDataFrameAPIPart1Test` not yet pinned —
 *
 *  - AQP-130: ORDER BY an error-function alias sorts by the error values
 *    (the bug title says "not supported"; the test body pins that it IS);
 *  - strict + LIMIT: the error check applies to the rows the query
 *    RETURNS — a failing group cut by the limit must not throw ("group by
 *    queries with limit not throwing exception if the relative error for
 *    valid rows is within limit"), while a failing group that survives
 *    the limit still must;
 *  - "bug absolute error 0 for closedform": top-k closed-form absolute
 *    errors are present and non-zero under an accepted strict budget;
 *  - ungrouped LOCAL_OMIT through the DataFrame API omits the whole row.
 */
class CommonBugs8Spec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._
  import graft.aqp.functions._
  import graft.implicits._

  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")

  private lazy val gs: GraftSession = {
    val g = new GraftSession(spark)
    li.createOrReplaceTempView("li_cb8")
    g.sql("CREATE SAMPLE TABLE li_cb8_s ON li_cb8 " +
      "OPTIONS(qcs 'l_returnflag', fraction '0.1')")
    g
  }

  override def afterAll(): Unit = {
    val g = new GraftSession(TestSpark.spark)
    GraftState.of(TestSpark.spark).samples.keys
      .filter(_.startsWith("li_cb8"))
      .toSeq.foreach(g.dropSampleTable)
    super.afterAll()
  }

  /** an error limit that exactly one group's relative error passes */
  private lazy val splitLimit: Double = {
    gs
    val res = gs.sql(
      """SELECT l_returnflag, sum(l_quantity) AS s, relative_error(s) AS re
        |FROM li_cb8 GROUP BY 1 WITH ERROR 0.9""".stripMargin)
      .collect().map(_.getDouble(2)).sorted
    assume(res.distinct.length >= 2, "need distinct per-group errors")
    (res(0) + res(1)) / 2
  }

  test("AQP-130: ORDER BY a relative_error alias sorts by the error values") {
    gs
    val rows = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").alias("s"), relative_error("s").alias("rel_err"))
      .orderBy(col("rel_err"))
      .withError(0.9, 0.9)
      .collect()
    assert(rows.length >= 2)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(2) <= b.getDouble(2),
        s"rows must come back sorted by rel_err: ${a.getDouble(2)} > ${b.getDouble(2)}")
    }
    // and the errors are real sampled-path errors, not zeros
    assert(rows.exists(_.getDouble(2) > 0.0))
  }

  test("strict + LIMIT enforces only the rows the query returns") {
    gs
    // best-group-first limit cuts every failing group: must answer
    val ok = gs.sql(
      s"""SELECT l_returnflag, sum(l_quantity) AS s, relative_error(s) AS re
         |FROM li_cb8 GROUP BY 1 ORDER BY re ASC LIMIT 1
         |WITH ERROR $splitLimit BEHAVIOR 'strict'""".stripMargin).collect()
    assert(ok.length === 1)
    assert(ok(0).getDouble(2) <= splitLimit, "the surviving row passes the budget")
    // worst-group-first limit keeps a failing group: must throw
    val ex = intercept[Exception] {
      gs.sql(
        s"""SELECT l_returnflag, sum(l_quantity) AS s, relative_error(s) AS re
           |FROM li_cb8 GROUP BY 1 ORDER BY re DESC LIMIT 1
           |WITH ERROR $splitLimit BEHAVIOR 'strict'""".stripMargin).collect()
    }
    assert(ex.toString.contains("ErrorLimitExceeded") ||
      Option(ex.getCause).exists(_.toString.contains("ErrorLimitExceeded")),
      s"expected ErrorLimitExceededException, got $ex")
    // the DataFrame-API shape of the reference test: sort by the estimate,
    // generous budget — collects without throwing
    val df = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").alias("s"), relative_error("s"))
      .orderBy(desc("s")).limit(2)
      .withError(0.5, 0.5, "strict")
    assert(df.collect().length === 2)
  }

  test("closed-form absolute errors on a top-k are present and non-zero") {
    gs
    val rows = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").alias("s"), absolute_error("s"))
      .orderBy(desc("s")).limit(3)
      .withError(0.5, 0.5, "strict")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.isNullAt(2), "absolute error must be present")
      assert(r.getDouble(2) != 0.0, "closed-form absolute error must be non-zero")
    }
  }

  test("ungrouped LOCAL_OMIT through the DataFrame API omits the whole row") {
    gs
    val r = li.agg(avg("l_quantity").alias("a"),
      lower_bound("a"), upper_bound("a"))
      .withError(0.0000001, 0.95, "local_omit")
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2),
      s"an impossible budget must omit the ungrouped row, got $r")
  }
}
