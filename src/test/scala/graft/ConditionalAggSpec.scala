package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._
import graft.sampling.StratifiedSampler

/** Conditional (filtered) approximate aggregation — the closed-form
 * variance's defining case: rows of a stratum filtered out of the query
 * contribute 0 to the conditional sum, so per-stratum variance divides by
 * the stratum's sampled count L, not the filtered count
 * (reference `errorEstimates.scala:212-262`). */
class ConditionalAggSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")

  test("filtered query over a sample: truth within CI") {
    val s = StratifiedSampler.sample(li, Seq("l_returnflag"), fraction = 0.15)
    val r = s.filter(col("l_quantity") > 25)
      .groupBy("l_returnflag")
      .agg(approx_sum(col("l_extendedprice"), col(weightColumn)).as("x"))
      .select(col("l_returnflag"), estimate(col("x")),
        lower_bound(col("x")), upper_bound(col("x"))).collect()
    val exact = li.filter(col("l_quantity") > 25)
      .groupBy("l_returnflag").agg(sum("l_extendedprice")).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r.nonEmpty)
    r.foreach { row =>
      val (est, lb, ub) = (row.getDouble(1), row.getDouble(2), row.getDouble(3))
      val truth = exact(row.getString(0))
      val half = (ub - lb) / 2
      assert(math.abs(est - truth) < 4 * half + 1e-9,
        s"${row.getString(0)}: est=$est truth=$truth ci=[$lb,$ub]")
    }
  }

  test("SQL WITH ERROR + WHERE routes through the sample and stays accurate") {
    val gs = new GraftSession(spark)
    li.createOrReplaceTempView("li_cond")
    gs.sql("CREATE SAMPLE TABLE li_cond_sample ON li_cond OPTIONS(qcs 'l_returnflag', fraction '0.2')")
    val p = gs.sql(
      """SELECT l_returnflag, sum(l_extendedprice) AS s, relative_error(s) AS re
        |FROM li_cond WHERE l_quantity > 25 GROUP BY 1 WITH ERROR 0.5""".stripMargin)
    assert(p.queryExecution.analyzed.treeString.contains("approx_sum_cf"))
    val rows = p.collect()
    val exact = li.filter(col("l_quantity") > 25)
      .groupBy("l_returnflag").agg(sum("l_extendedprice")).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) / exact(r.getString(0)) - 1.0) < 0.2)
      assert(r.getDouble(2) > 0.0)
    }
    gs.dropSampleTable("li_cond_sample")
  }

  test("nulls: count(col) skips nulls, count(*) does not; sum ignores nulls") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 10.0, "a"), (2L, null, "a"), (3L, 30.0, "a"),
      (4L, null, "b"), (5L, null, "b")).toDF("id", "v", "g")
    val s = StratifiedSampler.sample(df, Seq("g"), fraction = 1.0)
    val r = s.groupBy("g").agg(
      approx_count(col("v"), col(weightColumn)).as("cv"),
      approx_count(lit(1), col(weightColumn)).as("cstar"),
      approx_sum(col("v"), col(weightColumn)).as("sv"))
      .select(col("g"), estimate(col("cv")), estimate(col("cstar")), estimate(col("sv")))
      .collect().map(x => x.getString(0) -> ((x.getDouble(1), x.getDouble(2),
        if (x.isNullAt(3)) null else x.getDouble(3)))).toMap
    assert(r("a") === ((2.0, 3.0, 40.0)))
    assert(r("b")._1 === 0.0)
    assert(r("b")._2 === 2.0)
    assert(r("b")._3 === null) // SUM over all-null group is NULL
  }

  test("appendToSample: weighted estimates cover base + appended batch") {
    val gs = new GraftSession(spark)
    import spark.implicits._
    val batch1 = (1L to 600L).map(i => (i, if (i % 2 == 0) "x" else "y", i.toDouble))
      .toDF("id", "g", "v")
    batch1.createOrReplaceTempView("app_base")
    gs.createSampleTable("app_sample", "app_base", Seq("g"), fraction = 0.3)
    val batch2 = (601L to 1000L).map(i => (i, "x", i.toDouble)).toDF("id", "g", "v")
    gs.appendToSample("app_sample", batch2)
    val est = spark.table("app_sample")
      .agg(weighted_count(col("id"))).collect()(0).getDouble(0)
    assert(math.abs(est - 1000.0) / 1000.0 < 0.05, s"estimated $est of 1000")
    gs.dropSampleTable("app_sample")
  }

  test("session-wide implicit AQP: plain queries route once spark.sql.aqp.error is set") {
    // reference `Property.Error` semantics (`QueryRoutingRules.scala:133-145`):
    // with the session error property set, queries with NO trailing clause
    // still route through AQP — the "set error once, run normal queries"
    // workflow
    val gs = new GraftSession(spark)
    li.createOrReplaceTempView("li_implicit")
    gs.sql("CREATE SAMPLE TABLE li_implicit_s ON li_implicit " +
      "OPTIONS(qcs 'l_returnflag', fraction '0.3')")
    try {
      // before the conf: plain query is exact
      val before = gs.sql(
        "SELECT l_returnflag, sum(l_quantity) AS s FROM li_implicit GROUP BY 1")
      assert(!org.apache.spark.sql.graft.AqpInfo.usesSample(before))

      spark.conf.set("spark.sql.aqp.error", "0.9")
      try {
        val df = gs.sql(
          "SELECT l_returnflag, sum(l_quantity) AS s FROM li_implicit GROUP BY 1")
        assert(org.apache.spark.sql.graft.AqpInfo.usesSample(df),
          "session error property must make plain queries approximate")
        // error functions bind without any clause under the session property
        val r = gs.sql(
          "SELECT sum(l_quantity) AS s, absolute_error(s) AS ae FROM li_implicit")
          .collect()(0)
        assert(r.getDouble(1) > 0.0, "0.3 sample must carry error")
        // DDL and commands are untouched by the wrap
        assert(gs.sql("SHOW SAMPLE TABLES").collect()
          .exists(_.getString(0) == "li_implicit_s"))
        // an explicit clause still wins over the session default
        val strictExact = gs.sql(
          """SELECT l_returnflag, sum(l_quantity) AS s FROM li_implicit
            |GROUP BY 1 WITH ERROR 0.0000001 BEHAVIOR 'run_on_full_table'"""
            .stripMargin).collect().map(r2 => r2.getString(0) -> r2.getDouble(1)).toMap
        val exact = li.groupBy("l_returnflag").agg(sum("l_quantity")).collect()
          .map(r2 => r2.getString(0) -> r2.getDouble(1)).toMap
        assert(strictExact === exact)
      } finally spark.conf.unset("spark.sql.aqp.error")

      // conf unset: plain queries are exact again
      val after = gs.sql(
        "SELECT l_returnflag, sum(l_quantity) AS s FROM li_implicit GROUP BY 1")
      assert(!org.apache.spark.sql.graft.AqpInfo.usesSample(after))
    } finally gs.dropSampleTable("li_implicit_s")
  }

  test("AQP-285: error property is the on/OFF switch; confidence/behavior alone never enable") {
    // reference `AQPConnectionPropertySetTest.scala:120-215`: queries run
    // exact until `spark.sql.aqp.error` lands in (0,1); `set ...error=-1`
    // turns implicit AQP back OFF; setting only confidence or behavior
    // leaves queries exact
    val gs = new GraftSession(spark)
    li.createOrReplaceTempView("li_285")
    gs.sql("CREATE SAMPLE TABLE li_285_s ON li_285 " +
      "OPTIONS(qcs 'l_returnflag', fraction '0.3')")
    def plain() = gs.sql(
      "SELECT l_returnflag, sum(l_quantity) AS s FROM li_285 GROUP BY 1")
    try {
      assert(!org.apache.spark.sql.graft.AqpInfo.usesSample(plain()))
      // confidence alone: still exact
      spark.conf.set("spark.sql.aqp.confidence", "0.95")
      assert(!org.apache.spark.sql.graft.AqpInfo.usesSample(plain()),
        "confidence alone must not enable implicit AQP")
      // behavior alone: still exact
      spark.conf.set("spark.sql.aqp.behavior", "partial_run_on_base_table")
      assert(!org.apache.spark.sql.graft.AqpInfo.usesSample(plain()),
        "behavior alone must not enable implicit AQP")
      // error in range: approximate
      spark.conf.set("spark.sql.aqp.error", "0.5")
      assert(org.apache.spark.sql.graft.AqpInfo.usesSample(plain()))
      // the documented off-switch: error=-1 disables without unsetting
      spark.conf.set("spark.sql.aqp.error", "-1")
      assert(!org.apache.spark.sql.graft.AqpInfo.usesSample(plain()),
        "error=-1 must disable implicit AQP")
      // and an explicit clause with no number falls back to the stock
      // default, not the disabled -1
      val withClause = gs.sql(
        "SELECT sum(l_quantity) AS s, absolute_error(s) AS ae FROM li_285 " +
          "WITH ERROR").collect()(0)
      assert(withClause.getDouble(1) >= 0.0)
      // back on
      spark.conf.set("spark.sql.aqp.error", "0.5")
      assert(org.apache.spark.sql.graft.AqpInfo.usesSample(plain()))
    } finally {
      spark.conf.unset("spark.sql.aqp.error")
      spark.conf.unset("spark.sql.aqp.confidence")
      spark.conf.unset("spark.sql.aqp.behavior")
      gs.dropSampleTable("li_285_s")
    }
  }

  test("AQP-154: direct sample count estimates the base count under implicit AQP") {
    // reconciles the reference's two direct-sample behaviors: with NO error
    // clause and no session property, error fns are inert over raw sample
    // aggregates; the AQP-154 suite runs with the session error property
    // set, so the same query estimates the BASE table count (weighted)
    val gs = new GraftSession(spark)
    li.createOrReplaceTempView("li_154")
    gs.sql("CREATE SAMPLE TABLE li_154_s ON li_154 " +
      "OPTIONS(qcs 'l_returnflag', fraction '0.2', seed '5')")
    try {
      val actual = li.count()
      val rawSampleCount = gs.sql("SELECT count(*) AS c FROM li_154_s")
        .collect()(0).getLong(0)
      assert(rawSampleCount < actual, "no property, no clause -> raw sample rows")
      spark.conf.set("spark.sql.aqp.error", "0.9")
      try {
        val est = gs.sql(
          "SELECT count(*) AS c, absolute_error(c) AS ae FROM li_154_s")
          .collect()(0)
        assert(math.abs(est.getLong(0) - actual).toDouble / actual < 0.05,
          s"weighted count ${est.getLong(0)} should estimate base $actual")
        assert(!est.isNullAt(1))
      } finally spark.conf.unset("spark.sql.aqp.error")
    } finally gs.dropSampleTable("li_154_s")
  }

  test("session default error/confidence/behavior via spark.sql.aqp.* conf") {
    val gs = new GraftSession(spark)
    li.createOrReplaceTempView("li_conf")
    gs.sql("CREATE SAMPLE TABLE li_conf_sample ON li_conf OPTIONS(qcs 'l_returnflag', fraction '0.05')")
    spark.conf.set("spark.sql.aqp.error", "0.0000001")
    spark.conf.set("spark.sql.aqp.behavior", "run_on_full_table")
    try {
      // bare WITH ERROR picks up defaults → impossible limit → exact reroute
      val got = gs.sql("SELECT l_returnflag, sum(l_quantity) s FROM li_conf GROUP BY 1 WITH ERROR")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val want = li.groupBy("l_returnflag").agg(sum("l_quantity")).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got === want)
    } finally {
      spark.conf.unset("spark.sql.aqp.error")
      spark.conf.unset("spark.sql.aqp.behavior")
      gs.dropSampleTable("li_conf_sample")
    }
  }

  test("session-wide implicit AQP never wraps DML: INSERT persists exact values") {
    // at parse time INSERT is an InsertIntoStatement (not a catalyst
    // Command), so a naive non-Command check would wrap it and silently
    // persist approximate estimates into a real table
    val gs = new GraftSession(spark)
    li.createOrReplaceTempView("li_dml")
    gs.sql("CREATE SAMPLE TABLE li_dml_s ON li_dml OPTIONS(qcs 'l_returnflag', fraction '0.2')")
    val loc = java.nio.file.Files.createTempDirectory("graft_dml_").toString
    spark.sql(s"CREATE TABLE graft_dml_sink (s double) USING parquet LOCATION '$loc/t'")
    spark.conf.set("spark.sql.aqp.error", "0.9")
    try {
      // sanity: the same SELECT does route through the sample as a query
      assert(org.apache.spark.sql.graft.AqpInfo.usesSample(
        gs.sql("SELECT sum(l_quantity) AS s FROM li_dml")))
      gs.sql("INSERT INTO graft_dml_sink SELECT sum(l_quantity) AS s FROM li_dml")
      val persisted = spark.table("graft_dml_sink").collect()(0).getDouble(0)
      val exact = li.agg(sum("l_quantity")).collect()(0).getDouble(0)
      assert(persisted === exact,
        s"INSERT must persist the exact value, got $persisted vs $exact")
    } finally {
      spark.conf.unset("spark.sql.aqp.error")
      spark.sql("DROP TABLE IF EXISTS graft_dml_sink")
      gs.dropSampleTable("li_dml_s")
    }
  }
}
