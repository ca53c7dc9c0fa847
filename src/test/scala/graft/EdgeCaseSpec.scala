package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * Degenerate-input edge cases in the spirit of the reference's
 * `CommonBugTest` regressions: global (ungrouped) approximate aggregates,
 * filters that eliminate every row, empty base tables, and all-null
 * aggregation columns.
 */
class EdgeCaseSpec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._

  override def afterAll(): Unit = {
    GraftState.of(TestSpark.spark).samples.keys
      .filter(_.startsWith("li_ec") ).toSeq
      .foreach(new GraftSession(TestSpark.spark).dropSampleTable)
    super.afterAll()
  }

  private lazy val gs: GraftSession = {
    val g = new GraftSession(spark)
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li_ec")
    g.sql("CREATE SAMPLE TABLE li_ec_s ON li_ec OPTIONS(qcs 'l_returnflag', fraction '0.3')")
    g
  }

  test("global (ungrouped) approximate aggregate with error functions") {
    gs
    val truth = spark.sql("SELECT sum(l_quantity) FROM li_ec").collect()(0).getDouble(0)
    val r = gs.sql(
      """SELECT sum(l_quantity) AS s, absolute_error(s) AS ae,
        |       lower_bound(s) AS lb, upper_bound(s) AS ub
        |FROM li_ec WITH ERROR 0.9""".stripMargin).collect()(0)
    assert(r.getDouble(1) > 0)
    assert(r.getDouble(2) <= r.getDouble(0) && r.getDouble(0) <= r.getDouble(3))
    assert(math.abs(r.getDouble(0) - truth) <= 5 * r.getDouble(1))
  }

  test("filter eliminating every row yields an empty grouped result") {
    val rows = gs.sql(
      """SELECT l_returnflag, sum(l_quantity) AS s, absolute_error(s) AS ae
        |FROM li_ec WHERE l_quantity < -1
        |GROUP BY l_returnflag WITH ERROR 0.9""".stripMargin).collect()
    assert(rows.isEmpty)
  }

  test("filter eliminating every row on a GLOBAL aggregate yields null sum") {
    val r = gs.sql(
      """SELECT sum(l_quantity) AS s FROM li_ec WHERE l_quantity < -1
        |WITH ERROR 0.9""".stripMargin).collect()(0)
    assert(r.isNullAt(0)) // SQL semantics: SUM over zero rows is NULL
  }

  test("sample over an empty base table answers (emptily) without error") {
    spark.sql("SELECT * FROM li_ec WHERE 1=0").createOrReplaceTempView("li_ec_empty")
    gs.sql("CREATE SAMPLE TABLE li_ec_es ON li_ec_empty " +
      "OPTIONS(qcs 'l_returnflag', fraction '0.5')")
    try {
      val rows = gs.sql(
        """SELECT l_returnflag, sum(l_quantity) AS s
          |FROM li_ec_empty GROUP BY l_returnflag WITH ERROR 0.9""".stripMargin)
        .collect()
      assert(rows.isEmpty)
    } finally gs.dropSampleTable("li_ec_es")
  }

  test("all-null aggregation column: estimate is null, count skips nulls") {
    spark.sql("SELECT l_returnflag, CAST(NULL AS DOUBLE) AS nv FROM li_ec")
      .createOrReplaceTempView("li_ec_nulls")
    gs.sql("CREATE SAMPLE TABLE li_ec_ns ON li_ec_nulls " +
      "OPTIONS(qcs 'l_returnflag', fraction '1.0')")
    try {
      val rows = gs.sql(
        """SELECT l_returnflag, sum(nv) AS s, count(nv) AS c
          |FROM li_ec_nulls GROUP BY l_returnflag WITH ERROR 0.9""".stripMargin)
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.isNullAt(1), "sum of all-null column must be NULL")
        assert(r.getLong(2) === 0L, "count(col) must skip nulls")
      }
    } finally gs.dropSampleTable("li_ec_ns")
  }

  test("LIMIT over an approximate grouped query") {
    val rows = gs.sql(
      """SELECT l_returnflag, sum(l_quantity) AS s
        |FROM li_ec GROUP BY l_returnflag ORDER BY l_returnflag
        |LIMIT 2 WITH ERROR 0.9""".stripMargin).collect()
    assert(rows.length === 2)
  }
}
