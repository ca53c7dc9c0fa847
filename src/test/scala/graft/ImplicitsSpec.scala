package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * DataFrame-side syntax parity with the reference's
 * `org.apache.spark.sql.snappy._` implicits (`SparkSQLTest.scala:243-258`):
 * `stratifiedSample`, `insertIntoSampleTables`, `createApproxTSTopK`,
 * `errorStats`, `queryApproxTSTopK`.
 */
class ImplicitsSpec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._
  import graft.implicits._

  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")

  override def afterAll(): Unit = {
    val gs = new GraftSession(TestSpark.spark)
    GraftState.of(TestSpark.spark).samples.keys
      .filter(_.startsWith("li_imp")).toSeq.foreach(gs.dropSampleTable)
    super.afterAll()
  }

  test("stratifiedSample: option map with mixed value types, exact at 1.0") {
    val sampled = li.stratifiedSample(Map(
      "qcs" -> "l_returnflag", "fraction" -> 1.0, "strataReservoirSize" -> 50))
    assert(sampled.columns.contains(
      org.apache.spark.sql.graft.Weightage.WeightColumn))
    assert(sampled.count() === li.count())
    val frac = li.stratifiedSample(Map(
      "qcs" -> "l_returnflag", "fraction" -> "0.2", "seed" -> 7))
    val n = frac.count()
    assert(n > 0 && n < li.count())
  }

  test("stratifiedSample result is an inline sample under WITH ERROR (AQP-211)") {
    val gs = new GraftSession(spark)
    li.stratifiedSample(Map("qcs" -> "l_returnflag", "fraction" -> "1.0"))
      .createOrReplaceTempView("li_imp_inline")
    try {
      val truth = li.agg(sum("l_quantity")).collect()(0).getDouble(0)
      val r = gs.sql(
        """SELECT sum(l_quantity) AS s, absolute_error(s) AS ae
          |FROM li_imp_inline WITH ERROR 0.9""".stripMargin).collect()(0)
      assert(math.abs(r.getDouble(0) - truth) < 1e-6)
      assert(r.getDouble(1) === 0.0)
    } finally spark.catalog.dropTempView("li_imp_inline")
  }

  test("errorStats on a stratifiedSample frame, grouped") {
    val sampled = li.stratifiedSample(Map(
      "qcs" -> "l_returnflag", "fraction" -> 0.3, "seed" -> 11))
    val truth = li.groupBy("l_returnflag").agg(sum("l_quantity"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val stats = sampled.errorStats("l_quantity", groupBy = Seq("l_returnflag"))
      .collect()
    assert(stats.length === truth.size)
    stats.foreach { r =>
      val (flag, est, ae) = (r.getString(0), r.getDouble(1), r.getDouble(2))
      assert(ae > 0.0)
      assert(math.abs(est - truth(flag)) / truth(flag) < 0.3, s"$flag: $est")
      assert(r.getDouble(4) <= est && est <= r.getDouble(5))
    }
  }

  test("insertIntoSampleTables appends to a registered sample") {
    val gs = new GraftSession(spark)
    li.limit(0).createOrReplaceTempView("li_imp_seed")
    gs.sql("CREATE SAMPLE TABLE li_imp_s ON li_imp_seed " +
      "OPTIONS(qcs 'l_returnflag', fraction '1.0')")
    try {
      li.limit(500).insertIntoSampleTables("li_imp_s")
      val got = gs.sql(
        "SELECT sum(l_quantity) AS s FROM li_imp_s WITH ERROR 0.9")
        .collect()(0).getDouble(0)
      val want = li.limit(500).agg(sum("l_quantity")).collect()(0).getDouble(0)
      assert(math.abs(got - want) < 1e-6)
    } finally gs.dropSampleTable("li_imp_s")
  }

  test("createApproxTSTopK + queryApproxTSTopK round-trip") {
    val gs = new GraftSession(spark)
    li.select(col("l_returnflag"), col("l_quantity"))
      .createApproxTSTopK("li_imp_topk", None,
        Map("key" -> "l_returnflag", "size" -> 3, "capacity" -> "1000"))
    try {
      val top = gs.queryApproxTSTopK("li_imp_topk").collect()
      assert(top.nonEmpty && top.length <= 3)
      val exactTop = li.groupBy("l_returnflag").count()
        .orderBy(col("count").desc, col("l_returnflag"))
        .collect().map(_.getString(0)).head
      assert(top.head.getString(0) === exactTop,
        "capacity >= distinct keys makes Space-Saving/CMS exact on the head")
    } finally gs.sql("DROP TOPK TABLE li_imp_topk")
  }

  // --- reference AbstractAQPDataFrameAPIPart1Test "explicit routing on
  // error estimates failure" / "default behavior routing ..." — via the
  // df.withError implicit and STRING-alias error functions -----------------
  test("df.withError with an impossible budget: reroute answers exact values, zero errors, NULL bounds") {
    import graft.aqp.functions._
    val gs = new GraftSession(spark)
    li.createOrReplaceTempView("li_imp_we")
    gs.sql("CREATE SAMPLE TABLE li_imp_we_s ON li_imp_we " +
      "OPTIONS(qcs 'l_returnflag', fraction '0.2')")
    try {
      val exact = li.groupBy("l_returnflag")
        .agg(sum("l_quantity").alias("s")).orderBy(col("l_returnflag"))
        .collect().map(r => (r.getString(0), r.getDouble(1)))
      def run(behavior: String) = li.groupBy("l_returnflag")
        .agg(sum("l_quantity").alias("s"), absolute_error("s"),
          relative_error("s"), lower_bound("s"), upper_bound("s"))
        .orderBy(col("l_returnflag"))
        .withError(0.00001, 0.5, behavior)
        .collect()
      // explicit behavior, then behavior = null resolving through the
      // session default channel. The REFERENCE ships run_on_full_table as
      // its default; ours is do_nothing (SURVEY §3 divergence note) — the
      // conf emulates the reference default and pins the null→conf path.
      def checked(rows: Array[org.apache.spark.sql.Row], label: String): Unit = {
        assert(rows.length === exact.length)
        rows.zip(exact).foreach { case (r, (flag, s)) =>
          assert(r.getString(0) === flag)
          assert(r.getDouble(1) === s,
            s"impossible budget must answer exactly under '$label'")
          assert(r.getDouble(2) === 0.0 && r.getDouble(3) === 0.0,
            "rerouted rows report zero errors")
          assert(r.isNullAt(4) && r.isNullAt(5),
            "rerouted rows report NULL bounds")
        }
      }
      checked(run("run_on_full_table"), "run_on_full_table")
      spark.conf.set("spark.sql.aqp.behavior", "run_on_full_table")
      try checked(run(null), "session-default run_on_full_table")
      finally spark.conf.unset("spark.sql.aqp.behavior")
    } finally gs.dropSampleTable("li_imp_we_s")
  }

  test("df.withError multiple aggregates with string-alias bounds") {
    import graft.aqp.functions._
    val gs = new GraftSession(spark)
    li.createOrReplaceTempView("li_imp_we2")
    gs.sql("CREATE SAMPLE TABLE li_imp_we2_s ON li_imp_we2 " +
      "OPTIONS(qcs 'l_returnflag', fraction '0.2')")
    try {
      val rows = li.groupBy("l_returnflag")
        .agg(sum("l_quantity").alias("s"), lower_bound("s"),
          avg("l_quantity").alias("a"), lower_bound("a"))
        .orderBy(col("l_returnflag"))
        .withError(0.9, 0.95, "do_nothing")
        .collect()
      assert(rows.nonEmpty && rows.head.schema.length === 5)
      rows.foreach { r =>
        assert(!r.isNullAt(2) && r.getDouble(2) <= r.getDouble(1),
          "sum lower bound present and below the estimate")
        assert(!r.isNullAt(4) && r.getDouble(4) <= r.getDouble(3),
          "avg lower bound present and below the estimate")
      }
    } finally gs.dropSampleTable("li_imp_we2_s")
  }
}
