package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * Views formed over a sampled base table must still answer WITH ERROR
 * queries through the sample — the reference's view regression family
 * (`core/aqp/AbstractViewTest.scala:140-292`):
 *
 *  - SNAP-3131: a view projecting a SUBSET of the base columns answers
 *    count/sum/avg + error functions identically to the same query on the
 *    base table, grouped and ungrouped — the view's Project must not hide
 *    the base scan from sample substitution, and the hidden weight column
 *    must thread through the view's fixed output;
 *  - SNAP-3204_1: a view WITH a filter equals the equivalent inline
 *    derived table (both sampled);
 *  - SNAP-3204_2: a view computing IF(...)/CAST(substr(...)) projections
 *    still routes, and matches the inline derived-table form;
 *  - SNAP-3211: CREATE OR REPLACE VIEW whose body is a window-over-
 *    aggregate subquery parses and runs under the AQP parser/extensions.
 */
class ViewRoutingSpec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._

  private lazy val gs: GraftSession = {
    val g = new GraftSession(spark)
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li_vr")
    g.sql("CREATE SAMPLE TABLE li_vr_s ON li_vr " +
      "OPTIONS(qcs 'l_returnflag', fraction '0.1', strataReservoirSize '20')")
    g
  }

  override def afterAll(): Unit = {
    val g = new GraftSession(TestSpark.spark)
    GraftState.of(TestSpark.spark).samples.keys
      .filter(_.startsWith("li_vr")).toSeq.foreach(g.dropSampleTable)
    Seq("li_vr", "li_view_vr", "li_view_flt", "li_view_expr",
      "item_details_vr", "store_sales_vr", "item_vr")
      .foreach(v => TestSpark.spark.catalog.dropTempView(v))
    super.afterAll()
  }

  private def chosen: Option[String] = GraftState.of(spark).lastChosenSample

  private def rowsOf(sql: String): Array[org.apache.spark.sql.Row] = {
    val out = gs.sql(sql).collect()
    assert(chosen === Some("li_vr_s"), s"expected sample routing for: $sql")
    out
  }

  test("SNAP-3131: ungrouped count + error functions — view equals base exactly") {
    gs
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW li_view_vr AS " +
      "SELECT l_quantity, l_extendedprice, l_returnflag, l_linestatus FROM li_vr")
    val q = "SELECT count(*) AS c, count(*) AS sample_c, absolute_error(c) AS ae, " +
      "relative_error(c) AS re FROM %s WITH ERROR"
    val v = rowsOf(q.format("li_view_vr"))(0)
    val b = rowsOf(q.format("li_vr"))(0)
    assert(v.getLong(0) === b.getLong(0))
    assert(v.getLong(1) === b.getLong(1))
    assert(v.getDouble(2) === b.getDouble(2))
    assert(v.getDouble(3) === b.getDouble(3))
  }

  test("SNAP-3131: grouped avg/sum/count + all error functions — view equals base per group") {
    gs
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW li_view_vr AS " +
      "SELECT l_quantity, l_extendedprice, l_returnflag, l_linestatus FROM li_vr")
    val q = "SELECT avg(l_quantity) AS avgg, sum(l_extendedprice) AS suum, " +
      "count(*) AS couunt, absolute_error(suum) AS ae_s, relative_error(suum) AS re_s, " +
      "absolute_error(avgg) AS ae_a, relative_error(avgg) AS re_a, " +
      "absolute_error(couunt) AS ae_c, relative_error(couunt) AS re_c, l_returnflag " +
      "FROM %s GROUP BY l_returnflag WITH ERROR"
    val v = rowsOf(q.format("li_view_vr")).map(r => r.getString(9) -> r).toMap
    val b = rowsOf(q.format("li_vr")).map(r => r.getString(9) -> r).toMap
    assert(v.keySet === b.keySet && v.nonEmpty)
    for ((k, rv) <- v) {
      val rb = b(k)
      assert(rv.getDouble(0) === rb.getDouble(0), s"avg at $k")
      assert(rv.getDouble(1) === rb.getDouble(1), s"sum at $k")
      assert(rv.getLong(2) === rb.getLong(2), s"count at $k")
      (3 to 8).foreach(i => assert(rv.getDouble(i) === rb.getDouble(i), s"err fn $i at $k"))
    }
  }

  test("SNAP-3204_1: view with a filter equals the inline derived table") {
    gs
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW li_view_flt AS " +
      "SELECT l_quantity, l_extendedprice, l_returnflag FROM li_vr WHERE l_linenumber < 3")
    val v = rowsOf("SELECT count(*) AS c, sum(l_quantity) AS s, absolute_error(c) AS ae " +
      "FROM li_view_flt WITH ERROR")(0)
    val d = rowsOf("SELECT count(*) AS c, sum(l_quantity) AS s, absolute_error(c) AS ae " +
      "FROM (SELECT l_quantity, l_extendedprice, l_returnflag FROM li_vr " +
      "WHERE l_linenumber < 3) WITH ERROR")(0)
    assert(v.getLong(0) === d.getLong(0))
    assert(v.getDouble(1) === d.getDouble(1))
    assert(v.getDouble(2) === d.getDouble(2))
  }

  test("SNAP-3204_2: view computing IF/CAST-substr projections still routes") {
    gs
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW li_view_expr AS " +
      "SELECT IF(l_returnflag = 'A', l_quantity, NULL) AS qa, " +
      "IF(l_returnflag = 'R', l_quantity, NULL) AS qr, " +
      "CAST(substr(l_shipdate, 1, 4) AS INT) AS shipyear " +
      "FROM li_vr WHERE l_returnflag IN ('A', 'R')")
    val v = rowsOf("SELECT count(*) AS c, absolute_error(c) AS ae FROM li_view_expr WITH ERROR")(0)
    val d = rowsOf("SELECT count(*) AS c, absolute_error(c) AS ae FROM " +
      "(SELECT IF(l_returnflag = 'A', l_quantity, NULL) AS qa, " +
      "IF(l_returnflag = 'R', l_quantity, NULL) AS qr, " +
      "CAST(substr(l_shipdate, 1, 4) AS INT) AS shipyear " +
      "FROM li_vr WHERE l_returnflag IN ('A', 'R')) WITH ERROR")(0)
    assert(v.getLong(0) === d.getLong(0))
    assert(v.getDouble(1) === d.getDouble(1))
  }

  test("SNAP-3211: CREATE VIEW over window-over-aggregate body parses and runs") {
    gs
    spark.sql("SELECT l_partkey AS ss_item_sk, l_extendedprice AS ss_sales_price FROM li_vr")
      .createOrReplaceTempView("store_sales_vr")
    spark.sql("SELECT p_partkey AS i_item_sk, p_size AS i_manufact_id FROM " +
      s"parquet.`$sf/part.parquet`").createOrReplaceTempView("item_vr")
    gs.sql("CREATE OR REPLACE TEMPORARY VIEW item_details_vr AS SELECT * " +
      "FROM (SELECT i_manufact_id, sum(ss_sales_price) AS sum_sales, " +
      "avg(sum(ss_sales_price)) OVER (PARTITION BY i_manufact_id) AS avg_quarterly_sales " +
      "FROM item_vr, store_sales_vr WHERE ss_item_sk = i_item_sk GROUP BY i_manufact_id) tmp1 " +
      "WHERE avg_quarterly_sales > 0")
    assert(gs.sql("SELECT count(*) AS c FROM item_details_vr").collect()(0).getLong(0) > 0)
  }
}
