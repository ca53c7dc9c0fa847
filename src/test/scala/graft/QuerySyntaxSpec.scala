package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * WITH ERROR / DDL grammar coverage, mirroring the reference's
 * `QuerySyntaxTestSuite`: clause optionality, case-insensitivity,
 * scientific notation, trailing semicolons, behavior spellings, and DDL
 * option parsing.
 */
class QuerySyntaxSpec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._

  override def afterAll(): Unit = {
    GraftState.of(TestSpark.spark).samples.keys
      .filter(_.startsWith("li_qs")).toSeq
      .foreach(new GraftSession(TestSpark.spark).dropSampleTable)
    super.afterAll()
  }

  private lazy val gs: GraftSession = {
    val g = new GraftSession(spark)
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li_qs")
    g.sql("CREATE SAMPLE TABLE li_qs_s ON li_qs OPTIONS(qcs 'l_returnflag', fraction '1.0')")
    g
  }

  private def runs(sql: String): Unit =
    assert(gs.sql(sql).collect().nonEmpty, s"no rows from: $sql")

  test("clause optionality: error only / error+confidence / all three / bare") {
    gs
    val base = "SELECT l_returnflag, sum(l_quantity) AS s FROM li_qs GROUP BY 1"
    runs(s"$base WITH ERROR 0.1")
    runs(s"$base WITH ERROR 0.1 CONFIDENCE 0.99")
    runs(s"$base WITH ERROR 0.1 CONFIDENCE 0.99 BEHAVIOR 'do_nothing'")
    runs(s"$base WITH ERROR") // session defaults
  }

  test("case-insensitivity and whitespace tolerance") {
    val base = "SELECT l_returnflag, sum(l_quantity) AS s FROM li_qs GROUP BY 1"
    runs(s"$base with error 0.1")
    runs(s"$base WiTh   ErRoR   0.1   CoNfIdEnCe 0.95")
    runs(s"$base\nWITH ERROR 0.1\nBEHAVIOR 'DO_NOTHING'")
  }

  test("scientific notation and trailing semicolon") {
    val base = "SELECT l_returnflag, sum(l_quantity) AS s FROM li_qs GROUP BY 1"
    runs(s"$base WITH ERROR 1e-1")
    runs(s"$base WITH ERROR 0.1;")
    runs(s"$base WITH ERROR 2.5E-2 CONFIDENCE 9.5e-1 ;")
  }

  test("all five behavior spellings parse and execute") {
    val base = "SELECT l_returnflag, sum(l_quantity) AS s FROM li_qs GROUP BY 1"
    // full-fraction sample: zero observed error, so even strict passes
    Seq("do_nothing", "local_omit", "strict", "run_on_full_table",
      "partial_run_on_base_table").foreach { b =>
      runs(s"$base WITH ERROR 0.5 BEHAVIOR '$b'")
    }
    intercept[IllegalArgumentException] {
      gs.sql(s"$base WITH ERROR 0.5 BEHAVIOR 'bogus'").collect()
    }
  }

  test("DDL option parsing: mixed case keys, extra whitespace, dotted names") {
    gs.sql("CREATE SAMPLE TABLE li_qs_ddl ON li_qs OPTIONS( QCS  'l_returnflag' , " +
      "Fraction '0.5',  strataReservoirSize  '10' )")
    try {
      val info = gs.state.samples("li_qs_ddl")
      assert(info.qcs === Seq("l_returnflag"))
      assert(info.fraction === 0.5)
      assert(info.reservoirSize === 10)
    } finally gs.dropSampleTable("li_qs_ddl")
  }

  test("DROP SAMPLE TABLE IF EXISTS is tolerant; plain DROP throws") {
    gs.sql("DROP SAMPLE TABLE IF EXISTS never_created")
    intercept[IllegalArgumentException] {
      gs.sql("DROP SAMPLE TABLE never_created")
    }
  }

  test("non-AQP SQL passes through the parser untouched") {
    val n = gs.sql("SELECT count(*) AS c FROM li_qs WHERE l_quantity > 0")
      .collect()(0).getLong(0)
    assert(n > 0)
  }

  test("clause-looking text inside literals and identifiers passes through") {
    // a statement that PARSES under stock Spark must never be rewrapped,
    // even when it ends in text resembling a trailing clause
    val r1 = gs.sql("SELECT 'with error 0.5' AS s FROM li_qs LIMIT 1").collect()(0)
    assert(r1.getString(0) === "with error 0.5")
    val r2 = gs.sql("SELECT 'confidence .95' AS s FROM li_qs LIMIT 1").collect()(0)
    assert(r2.getString(0) === "confidence .95")
    // a column aliased 'confidence' is an identifier, not a clause
    val r3 = gs.sql("SELECT l_quantity AS confidence FROM li_qs LIMIT 1").collect()
    assert(r3.length === 1)
    // invalid SQL that happens to end in a clause-like token still reports
    // the stock parser's error, not a bogus AQP wrap
    intercept[Exception] {
      gs.sql("SELECT FROM WHERE confidence 0.95")
    }
    // a valid query ENDING in a clause-looking string literal must run
    // unmodified (the eager WITH ERROR pattern match has to back off when
    // the prefix is not parseable but the whole statement is)
    val r4 = gs.sql(
      "SELECT count(*) AS c FROM li_qs WHERE 'x' != 'with error 0.5'")
      .collect()(0)
    assert(r4.getLong(0) > 0)
    val r5 = gs.sql(
      "SELECT count(*) AS c FROM li_qs WHERE 'x' != 'confidence .9'")
      .collect()(0)
    assert(r5.getLong(0) > 0)
    // clause-looking text in a trailing COMMENT is not a clause either
    val r6 = gs.sql(
      "SELECT count(*) AS c FROM li_qs -- with error 0.5")
      .collect()(0)
    assert(r6.getLong(0) > 0)
  }

  test("SHOW SAMPLE/TOPK/STREAM TABLES list the registered structures") {
    runs("SELECT 1 AS one FROM li_qs LIMIT 1") // force sample registration
    val samples = gs.sql("SHOW SAMPLE TABLES").collect()
    val mine = samples.find(_.getString(0) == "li_qs_s")
    assert(mine.isDefined, s"li_qs_s missing from ${samples.mkString(",")}")
    assert(mine.get.getString(1) === "li_qs")
    assert(mine.get.getString(3) === "1.0")
    // empty listings are well-formed, not errors
    assert(gs.sql("SHOW TOPK TABLES").columns.toSeq ===
      Seq("name", "base", "key", "variant", "size"))
    assert(gs.sql("SHOW STREAM TABLES").columns.toSeq ===
      Seq("name", "format", "running"))
  }

  test("standalone CONFIDENCE / BEHAVIOR clauses (no WITH ERROR) parse and run") {
    // every clause of the reference grammar is independently optional
    // (`snappyAQPParsers.scala:48-71`); `QueryRoutingTestSuite` "test query
    // without aggregate" fires `... confidence .95` with no WITH ERROR
    val base = "SELECT l_returnflag, sum(l_quantity) AS s FROM li_qs GROUP BY 1"
    runs(s"$base CONFIDENCE .95")
    runs(s"$base CONFIDENCE 0.95 BEHAVIOR 'do_nothing'")
    runs(s"$base BEHAVIOR 'run_on_full_table'")
    runs(s"$base CONFIDENCE .95 WITH ERROR") // bare WITH ERROR after confidence
    // standalone confidence still range-validates
    intercept[UnsupportedOperationException] { gs.sql(s"$base CONFIDENCE 1.5") }
    // a full-fraction sample estimates exactly, so the estimate matches base
    val exact = gs.sql(base).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaConf = gs.sql(s"$base CONFIDENCE .95").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaConf === exact)
  }

  test("non-aggregate query under WITH ERROR / CONFIDENCE returns base rows") {
    // reference `QueryRoutingTestSuite` "test query without aggregate":
    // nothing to approximate -> identical rows to the population query
    val base = "SELECT l_orderkey AS num FROM li_qs WHERE l_quantity > 45 ORDER BY num"
    val pop = gs.sql(base).collect().map(_.getLong(0)).toSeq
    assert(pop.nonEmpty)
    for (suffix <- Seq("CONFIDENCE .95", "WITH ERROR .95",
        "WITH ERROR .95 CONFIDENCE .95")) {
      val got = gs.sql(s"$base $suffix").collect().map(_.getLong(0)).toSeq
      assert(got === pop, s"rows diverged under: $suffix")
    }
  }

  test("WITH ERROR / CONFIDENCE values outside (0,1) are rejected at parse") {
    // reference `QueryProcessingRules.scala:1251-1263` (MaxErrorAllowed):
    // error 0 / ≥1 and confidence ≤0 / ≥1 throw with the reference's message
    val base = "SELECT l_returnflag, sum(l_quantity) s FROM li_qs GROUP BY 1"
    def rejected(sql: String, what: String): Unit = {
      val e = intercept[UnsupportedOperationException] { gs.sql(sql) }
      assert(e.getMessage.contains(s"specify $what within range of 0 to 1"),
        s"wrong message for: $sql -> ${e.getMessage}")
    }
    rejected(s"$base WITH ERROR 1.5", "error")
    rejected(s"$base WITH ERROR 1.0", "error")
    rejected(s"$base WITH ERROR 0", "error")
    rejected(s"$base WITH ERROR -0.5", "error")
    rejected(s"$base WITH ERROR 0.5 CONFIDENCE 0", "confidence")
    rejected(s"$base WITH ERROR 0.5 CONFIDENCE 1.0", "confidence")
    rejected(s"$base WITH ERROR 0.5 CONFIDENCE -0.9", "confidence")
    rejected(s"$base WITH ERROR 0.5 CONFIDENCE 1e2", "confidence")
    // boundary-legal values still run
    assert(gs.sql(s"$base WITH ERROR 0.99 CONFIDENCE 0.01").collect().nonEmpty)
  }
}
