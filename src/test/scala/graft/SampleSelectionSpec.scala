package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Multi-sample QCS-ranking corners ported from the reference's
 * `SampleSelectionTestSuite` (`src/test/scala/io/snappydata/core/aqp/
 * SampleSelectionTestSuite.scala:155-260`): four samples on one base with
 * overlapping QCS, and the rewrite must pick the reference's choice —
 * exact QCS match first; among strict supersets the LARGEST sample size
 * (fraction) regardless of QCS width (`QueryProcessingRules.scala:462-478`);
 * among subsets the largest overlap then largest fraction; function-QCS
 * tables only on an expression-exact grouping match.
 *
 * Column mapping onto the testdata: UniqueCarrier→l_returnflag,
 * MonthI→l_linenumber, YearI→l_linestatus, ArrDelay/ArrTime→l_quantity.
 */
class SampleSelectionSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {
  import TestSpark._

  // samples pool across PLAN-EQUAL bases session-wide — leaving these four
  // registered would bias every later suite reading the same parquet
  override def afterAll(): Unit = {
    GraftState.of(spark).samples.keys
      .filter(_.startsWith("sel_s"))
      .foreach(gs.dropSampleTable)
    super.afterAll()
  }

  private lazy val gs: GraftSession = {
    val g = new GraftSession(spark)
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li_sel")
    g.sql("CREATE SAMPLE TABLE sel_s1 ON li_sel OPTIONS(" +
      "qcs 'l_returnflag, l_linenumber, l_linestatus', fraction '0.03', " +
      "strataReservoirSize '20')")
    g.sql("CREATE SAMPLE TABLE sel_s2 ON li_sel OPTIONS(" +
      "qcs 'l_returnflag, l_linenumber', fraction '0.01', " +
      "strataReservoirSize '20')")
    g.sql("CREATE SAMPLE TABLE sel_s3 ON li_sel OPTIONS(" +
      "qcs 'l_returnflag, l_linenumber, l_linestatus', fraction '0.05', " +
      "strataReservoirSize '20')")
    g.sql("CREATE SAMPLE TABLE sel_s4 ON li_sel OPTIONS(" +
      "qcs 'tan(l_quantity)', fraction '0.05', strataReservoirSize '20')")
    g
  }

  private def chosenFor(sql: String): Option[String] = {
    gs.sql(sql).collect()
    GraftState.of(spark).lastChosenSample
  }

  test("queryQCS = tableQCS: the exact match wins over a bigger superset") {
    val chosen = chosenFor(
      """SELECT avg(l_quantity) AS t, lower_bound(t) AS lb, upper_bound(t) AS ub
        |FROM li_sel WHERE l_linenumber > 2
        |GROUP BY l_returnflag WITH ERROR 0.12 CONFIDENCE 0.9""".stripMargin)
    assert(chosen === Some("sel_s2"),
      "exact {l_returnflag,l_linenumber} match beats larger supersets")
  }

  test("no exact match: the LARGEST superset sample wins, not the narrowest") {
    // query QCS {l_returnflag}: s1/s2/s3 are all supersets; the reference
    // picks the largest fraction (s3, 0.05) — NOT the narrowest QCS (s2)
    val chosen = chosenFor(
      """SELECT avg(l_quantity) AS t, absolute_error(t) AS ae
        |FROM li_sel GROUP BY l_returnflag
        |WITH ERROR 0.12 CONFIDENCE 0.9""".stripMargin)
    assert(chosen === Some("sel_s3"),
      "among supersets, largest sample size wins (reference :462-478)")
  }

  test("tableQCS subset of queryQCS: largest overlap, then largest fraction") {
    // query QCS {l_returnflag,l_linenumber,l_linestatus,l_quantity}: s1 and
    // s3 tie on overlap 3, fraction breaks the tie toward s3
    val chosen = chosenFor(
      """SELECT avg(l_quantity) AS t, relative_error(t) AS re
        |FROM li_sel
        |WHERE l_linenumber > 2 AND l_linestatus = 'O' AND l_quantity > 0
        |GROUP BY l_returnflag WITH ERROR 0.12 CONFIDENCE 0.9""".stripMargin)
    assert(chosen === Some("sel_s3"))
  }

  test("function-QCS table is NOT picked when grouping is only its input column") {
    // grouping on raw l_quantity does not match qcs 'tan(l_quantity)';
    // the best attribute-overlap subset (s3) wins
    val chosen = chosenFor(
      """SELECT avg(l_extendedprice) AS t, absolute_error(t) AS ae
        |FROM li_sel WHERE l_linenumber > 2 AND l_linestatus = 'O'
        |GROUP BY l_quantity WITH ERROR 0.2 CONFIDENCE 0.9""".stripMargin)
    assert(chosen === Some("sel_s3"))
  }

  test("grouping matches the function QCS exactly: the function-QCS table wins") {
    val chosen = chosenFor(
      """SELECT avg(l_extendedprice) AS t, absolute_error(t) AS ae
        |FROM li_sel WHERE l_linenumber > 2 AND l_linestatus = 'O'
        |GROUP BY tan(l_quantity) WITH ERROR 0.2 CONFIDENCE 0.9""".stripMargin)
    assert(chosen === Some("sel_s4"),
      "expression-exact grouping promotes the function-QCS sample")
  }

  test("base-routed query resets the hook") {
    val c1 = chosenFor(
      """SELECT count(DISTINCT l_returnflag) AS c
        |FROM li_sel WITH ERROR 0.2""".stripMargin)
    assert(c1 === None, "distinct aggregates route to base: no sample chosen")
  }
}
