package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * Randomized differential sweep of the AQP rewrite: on a full-fraction
 * sample every weighted estimate is exact and every error is exactly zero,
 * so ANY generated query must reproduce the stock-Spark answer bit-for-bit
 * (up to double rounding). Exercises random combinations of grouping,
 * aggregate shapes (incl. compound expressions), filters, HAVING, ORDER BY
 * and error functions — the combinations no hand-written test enumerates.
 */
class RewriteFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  override def afterAll(): Unit = {
    GraftState.of(TestSpark.spark).samples.keys
      .filter(_.startsWith("li_fz")).toSeq
      .foreach(new GraftSession(TestSpark.spark).dropSampleTable)
    super.afterAll()
  }
  import TestSpark._

  private lazy val gs: GraftSession = {
    val g = new GraftSession(spark)
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li_fz")
    spark.read.parquet(s"$sf/orders.parquet").createOrReplaceTempView("ord_fz")
    g.sql("CREATE SAMPLE TABLE li_fz_s ON li_fz OPTIONS(qcs 'l_returnflag', fraction '1.0')")
    g
  }

  private val numCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private val grpCols = Seq("l_returnflag", "l_linestatus")

  private def genQuery(rnd: scala.util.Random): (String, String) = {
    val groups = rnd.shuffle(grpCols).take(1 + rnd.nextInt(2))
    def c() = numCols(rnd.nextInt(numCols.length))
    val aggDefs = (0 until (1 + rnd.nextInt(3))).map { i =>
      rnd.nextInt(6) match {
        case 0 => s"round(sum(${c()}), 4) AS a$i"
        case 1 => s"round(avg(${c()}), 6) AS a$i"
        case 2 => s"count(*) AS a$i"
        case 3 => s"round(sum(${c()} * (1 - ${c()})), 4) AS a$i"
        case 4 => s"round(avg(${c()} + ${c()}), 6) AS a$i"
        case 5 => s"round(sum(${c()}) / count(*), 6) AS a$i"
      }
    }
    val where = rnd.nextInt(3) match {
      case 0 => ""
      case 1 => s" WHERE l_quantity > ${1 + rnd.nextInt(40)}"
      case 2 => s" WHERE l_extendedprice < ${5000 + rnd.nextInt(50000)}"
    }
    val having = if (rnd.nextBoolean()) " HAVING count(*) > 0" else ""
    // grouping-set shapes thread the weight through Expand (q18's rule);
    // every composite group key is unique, so ORDER BY groups is total and
    // an optional LIMIT compares prefix-for-prefix
    val grpExpr = rnd.nextInt(6) match {
      case 4 => s"ROLLUP(${groups.mkString(", ")})"
      case 5 => s"CUBE(${groups.mkString(", ")})"
      case _ => groups.mkString(", ")
    }
    val limit = if (rnd.nextInt(3) == 0) s" LIMIT ${3 + rnd.nextInt(7)}" else ""
    val order = s" ORDER BY ${groups.mkString(", ")}"
    val select = s"SELECT ${groups.mkString(", ")}, ${aggDefs.mkString(", ")}"
    val core = s"$select FROM li_fz$where GROUP BY $grpExpr$having$order$limit"
    // error functions on the first aggregate alias — must be exactly zero
    val aqp = s"$select, round(absolute_error(a0), 6) AS ae, " +
      s"round(relative_error(a0), 6) AS re " +
      s"FROM li_fz$where GROUP BY $grpExpr$having$order$limit WITH ERROR 0.9"
    (core, aqp)
  }

  test("30 random query shapes at fraction 0.3: estimates framed by their own bounds") {
    gs // force base view registration
    gs.sql("CREATE SAMPLE TABLE li_fz_p ON li_fz OPTIONS(qcs 'l_returnflag', fraction '0.3')")
    try {
      val rnd = new scala.util.Random(77L)
      (0 until 30).foreach { i =>
        val (core, aqp) = genQuery(rnd)
        // swap in bounds instead of the zero-error assertions
        val aqpB = aqp.replace(
          "round(absolute_error(a0), 6) AS ae, round(relative_error(a0), 6) AS re",
          "absolute_error(a0) AS ae, lower_bound(a0) AS lb, upper_bound(a0) AS ub")
        val want = spark.sql(core).collect()
        val got = try gs.sql(aqpB).collect() catch {
          case e: Throwable => fail(s"query $i failed: $aqpB\n${e.getMessage}")
        }
        assert(got.length === want.length, s"query $i row count\n$aqpB")
        val n = want.head.length
        got.zip(want).foreach { case (g, _) =>
          assert(g.getDouble(n) >= 0.0 && g.getDouble(n + 1) <= g.getDouble(n + 2),
            s"query $i bounds disordered\n$aqpB")
        }
        // deterministic replay: truth within 6 half-widths of the estimate
        // for the first aggregate a0, which sits right after the group cols
        val grpN = aqpB.split("GROUP BY")(1).split("HAVING|ORDER BY")(0)
          .split(",").length
        got.zip(want).foreach { case (g, w) =>
          (g.get(grpN), w.get(grpN)) match {
            case (a: Double, b: Double) =>
              val ae = math.max(g.getDouble(n), math.abs(b) * 1e-9 + 1e-9)
              assert(math.abs(a - b) <= 6 * ae + 1e-6,
                s"query $i a0: est $a truth $b absErr ${g.getDouble(n)}\n$aqpB")
            case (a: Long, b: Long) =>
              val ae = math.max(g.getDouble(n), 1.0)
              assert(math.abs(a - b) <= 6 * ae,
                s"query $i a0: est $a truth $b\n$aqpB")
            case _ =>
          }
        }
      }
    } finally gs.dropSampleTable("li_fz_p")
  }

  /** Join / derived-table shapes: the structural combinations the
   * hand-written routing tests don't enumerate. */
  private def genStructuredQuery(rnd: scala.util.Random): (String, String) = {
    def c() = numCols(rnd.nextInt(numCols.length))
    rnd.nextInt(3) match {
      case 0 => // join to orders, group by a dim column
        val m = c()
        val whereJ = if (rnd.nextBoolean()) " WHERE o_totalprice > 1000" else ""
        val core = s"SELECT o_orderpriority, round(sum($m), 4) AS a0 " +
          s"FROM li_fz JOIN ord_fz ON l_orderkey = o_orderkey$whereJ " +
          "GROUP BY o_orderpriority ORDER BY o_orderpriority"
        val aqp = s"SELECT o_orderpriority, round(sum($m), 4) AS a0, " +
          "round(absolute_error(a0), 6) AS ae " +
          s"FROM li_fz JOIN ord_fz ON l_orderkey = o_orderkey$whereJ " +
          "GROUP BY o_orderpriority ORDER BY o_orderpriority WITH ERROR 0.9"
        (core, aqp)
      case 1 => // derived aggregate re-aggregated above
        val m = c()
        val core = "SELECT l_returnflag, round(sum(inner_a), 4) AS a0 FROM " +
          s"(SELECT l_returnflag, l_orderkey, sum($m) AS inner_a " +
          "FROM li_fz GROUP BY l_returnflag, l_orderkey) " +
          "GROUP BY l_returnflag ORDER BY l_returnflag"
        val aqp = "SELECT l_returnflag, round(sum(inner_a), 4) AS a0 FROM " +
          s"(SELECT l_returnflag, l_orderkey, sum($m) AS inner_a " +
          "FROM li_fz GROUP BY l_returnflag, l_orderkey) " +
          "GROUP BY l_returnflag ORDER BY l_returnflag WITH ERROR 0.9"
        (core, aqp)
      case 2 => // join + compound measure + HAVING
        val (m1, m2) = (c(), c())
        val having = " HAVING count(*) > 1"
        val core = s"SELECT o_orderpriority, round(sum($m1 * (1 - $m2)), 4) AS a0, " +
          "count(*) AS c0 FROM li_fz JOIN ord_fz ON l_orderkey = o_orderkey " +
          s"GROUP BY o_orderpriority$having ORDER BY o_orderpriority"
        val aqp = s"SELECT o_orderpriority, round(sum($m1 * (1 - $m2)), 4) AS a0, " +
          "count(*) AS c0, round(absolute_error(a0), 6) AS ae " +
          "FROM li_fz JOIN ord_fz ON l_orderkey = o_orderkey " +
          s"GROUP BY o_orderpriority$having ORDER BY o_orderpriority WITH ERROR 0.9"
        (core, aqp)
    }
  }

  test("25 random join/derived shapes: full-fraction rewrite is exact") {
    gs
    val rnd = new scala.util.Random(42421L)
    (0 until 25).foreach { i =>
      val (core, aqp) = genStructuredQuery(rnd)
      val want = spark.sql(core).collect()
      val got = try gs.sql(aqp).collect() catch {
        case e: Throwable => fail(s"query $i failed: $aqp\n${e.getMessage}")
      }
      assert(got.length === want.length, s"query $i row count: $aqp")
      got.zip(want).foreach { case (g, w) =>
        (0 until w.length).foreach { j =>
          (g.get(j), w.get(j)) match {
            case (a: Double, b: Double) =>
              assert(math.abs(a - b) <= math.max(1e-6, math.abs(b) * 1e-9),
                s"query $i col $j: $a vs $b\n$aqp")
            case (gv, wv) => assert(gv === wv, s"query $i col $j: $gv vs $wv\n$aqp")
          }
        }
        // appended error column (when present) must be exactly zero at
        // full fraction — derived-shape queries (case 1) have none
        if (g.length > w.length)
          assert(g.getDouble(w.length) === 0.0, s"query $i abs_err nonzero\n$aqp")
      }
    }
  }

  test("30 random shapes x clause variants: every grammar form is exact at full fraction") {
    // the full trailing-clause grammar (each clause independently optional,
    // bare WITH ERROR after CONFIDENCE, implicit session-wide AQP) must not
    // change results on a full-fraction sample
    gs
    val rnd = new scala.util.Random(88331L)
    val variants: Seq[(String, Boolean)] = Seq( // (suffix, needsSessionConf)
      (" WITH ERROR 0.9", false),
      (" CONFIDENCE .95", false),
      (" CONFIDENCE .9 BEHAVIOR 'do_nothing'", false),
      (" BEHAVIOR 'run_on_full_table'", false),
      (" CONFIDENCE .95 WITH ERROR", false),
      ("", true)) // no clause at all: session property triggers AQP
    (0 until 30).foreach { i =>
      val (core, _) = genQuery(rnd)
      val (suffix, needsConf) = variants(i % variants.length)
      val want = spark.sql(core).collect()
      if (needsConf) spark.conf.set("spark.sql.aqp.error", "0.9")
      val got = try gs.sql(core + suffix).collect() catch {
        case e: Throwable => fail(s"query $i failed: $core$suffix\n${e.getMessage}")
      } finally if (needsConf) spark.conf.unset("spark.sql.aqp.error")
      assert(got.length === want.length, s"query $i row count: $core$suffix")
      got.zip(want).foreach { case (g, w) =>
        (0 until w.length).foreach { j =>
          (g.get(j), w.get(j)) match {
            case (a: Double, b: Double) =>
              assert(math.abs(a - b) <= math.max(1e-6, math.abs(b) * 1e-9),
                s"query $i col $j: $a vs $b\n$core$suffix")
            case (gv, wv) => assert(gv === wv, s"query $i col $j: $gv vs $wv\n$core$suffix")
          }
        }
      }
    }
  }

  test("24 error-function PLACEMENT shapes: HAVING/ORDER BY/CASE/arithmetic, exact-zero algebra at full fraction") {
    // the placement grammar the hand-written ErrorEstimateFunctionTest
    // scenarios sample one-by-one: error functions inside HAVING, ORDER BY,
    // CASE, and arithmetic over MULTIPLE error functions. At full fraction
    // every error is exactly 0 and both bounds equal the estimate, so each
    // placement has a closed-form oracle against the stock-Spark core.
    gs
    val rnd = new scala.util.Random(55112L)
    (0 until 24).foreach { i =>
      val grp = grpCols(rnd.nextInt(grpCols.length))
      val (m1, m2) = (numCols(rnd.nextInt(numCols.length)),
        numCols(rnd.nextInt(numCols.length)))
      val where = if (rnd.nextBoolean()) s" WHERE l_quantity > ${rnd.nextInt(30)}" else ""
      val base = s"$grp, round(sum($m1), 4) AS a0, round(avg($m2), 6) AS a1"
      val core = s"SELECT $base FROM li_fz$where GROUP BY $grp ORDER BY $grp"
      val want = spark.sql(core).collect()
      val (aqp, check): (String, Array[org.apache.spark.sql.Row] => Unit) =
        i % 6 match {
          case 0 => // bound arithmetic: CI width is exactly zero
            (s"SELECT $base, round(upper_bound(a0) - lower_bound(a0), 6) AS x " +
              s"FROM li_fz$where GROUP BY $grp ORDER BY $grp WITH ERROR 0.9",
              rows => rows.foreach(r => assert(r.getDouble(3) === 0.0,
                s"CI width must be 0 at full fraction (query $i)")))
          case 1 => // arithmetic over error fns of TWO different aggregates
            (s"SELECT $base, round(absolute_error(a0) + relative_error(a1), 6) AS x " +
              s"FROM li_fz$where GROUP BY $grp ORDER BY $grp WITH ERROR 0.9",
              rows => rows.foreach(r => assert(r.getDouble(3) === 0.0,
                s"error sum across aggregates must be 0 (query $i)")))
          case 2 => // CASE over an error fn: never fires at zero error
            (s"SELECT $base, CASE WHEN relative_error(a0) > 0.5 " +
              "THEN CAST(NULL AS DOUBLE) ELSE a0 END AS x " +
              s"FROM li_fz$where GROUP BY $grp ORDER BY $grp WITH ERROR 0.9",
              rows => rows.foreach(r => assert(!r.isNullAt(3) &&
                r.getDouble(3) === r.getDouble(1),
                s"CASE over zero error must pass a0 through (query $i)")))
          case 3 => // HAVING on an error fn: always passes at zero error
            (s"SELECT $base FROM li_fz$where GROUP BY $grp " +
              s"HAVING absolute_error(a0) <= 0.5 ORDER BY $grp WITH ERROR 0.9",
              rows => assert(rows.length === want.length,
                s"HAVING over zero error must keep every group (query $i)"))
          case 4 => // ORDER BY an error fn: all-equal keys degrade to group order
            (s"SELECT $base FROM li_fz$where GROUP BY $grp " +
              s"ORDER BY relative_error(a0), $grp WITH ERROR 0.9",
              rows => rows.map(_.getString(0)).zip(want.map(_.getString(0)))
                .foreach { case (g, w) => assert(g === w,
                  s"ORDER BY zero-error then group must be group order (query $i)") })
          case 5 => // bound of the SECOND aggregate equals its estimate
            (s"SELECT $base, round(lower_bound(a1), 6) AS x " +
              s"FROM li_fz$where GROUP BY $grp ORDER BY $grp WITH ERROR 0.9",
              rows => rows.foreach(r => assert(
                math.abs(r.getDouble(3) - r.getDouble(2)) <= 1e-6,
                s"lower bound must equal the estimate at full fraction (query $i)")))
        }
      val got = try gs.sql(aqp).collect() catch {
        case e: Throwable => fail(s"query $i failed: $aqp\n${e.getMessage}")
      }
      // group keys + shared aggregates always reproduce the core
      got.zip(want).foreach { case (g, w) =>
        assert(g.getString(0) === w.getString(0), s"query $i keys\n$aqp")
        assert(math.abs(g.getDouble(1) - w.getDouble(1)) <= 1e-6 &&
          math.abs(g.getDouble(2) - w.getDouble(2)) <= 1e-6,
          s"query $i aggregates must be exact at full fraction\n$aqp")
      }
      check(got)
    }
  }

  test("50 random query shapes: full-fraction rewrite is exact with zero error") {
    gs // force view + sample registration before the stock-Spark side runs
    val rnd = new scala.util.Random(20260812L)
    (0 until 50).foreach { i =>
      val (core, aqp) = genQuery(rnd)
      val want = spark.sql(core).collect()
      val got = try gs.sql(aqp).collect() catch {
        case e: Throwable => fail(s"query $i failed: $aqp\n${e.getMessage}")
      }
      assert(got.length === want.length, s"query $i row count: $aqp")
      got.zip(want).foreach { case (g, w) =>
        (0 until w.length).foreach { j =>
          val (gv, wv) = (g.get(j), w.get(j))
          (gv, wv) match {
            case (a: Double, b: Double) =>
              assert(math.abs(a - b) <= math.max(1e-6, math.abs(b) * 1e-9),
                s"query $i col $j: $a vs $b\n$aqp")
            case _ => assert(gv === wv, s"query $i col $j: $gv vs $wv\n$aqp")
          }
        }
        // the two appended error columns are exactly zero
        assert(g.getDouble(w.length) === 0.0, s"query $i abs_err nonzero\n$aqp")
        assert(g.getDouble(w.length + 1) === 0.0, s"query $i rel_err nonzero\n$aqp")
      }
    }
  }

  test("30 random shapes: the DataFrame-API path answers identically to SQL") {
    // the two entry points build different trees (parser + clause rewrite
    // vs implicits + placeholder) that must converge on the SAME rewritten
    // plan — the strict-above-limit divergence was exactly this seam.
    // Same sample, same estimator ⇒ bit-identical answers (or the same
    // throw) on every generated shape.
    import org.apache.spark.sql.functions._
    import graft.aqp.functions
    import graft.implicits._
    gs
    // a SEPARATE base over its own files: li_fz's full-fraction sample
    // would always outrank a 0.3 sample (same tier, larger fraction),
    // running every shape at exactly-zero error — and sample matching is
    // by plan, so a mere second VIEW over the same parquet still matches
    // it. A physically distinct copy makes li_fz2_s3 the only candidate.
    val cpDir = java.nio.file.Files.createTempDirectory("graft_dfsql").toString + "/li"
    spark.read.parquet(s"$sf/lineitem.parquet").write.parquet(cpDir)
    spark.read.parquet(cpDir).createOrReplaceTempView("li_fz2")
    gs.sql("CREATE SAMPLE TABLE IF NOT EXISTS li_fz2_s3 ON li_fz2 " +
      "OPTIONS(qcs 'l_returnflag', fraction '0.3')")
    val li = spark.table("li_fz2")
    val rnd = new scala.util.Random(20260814L)
    var sawNonzeroError = false
    def runToOutcome(label: String)(
        f: => Array[org.apache.spark.sql.Row]): Either[String, Seq[Seq[Any]]] =
      try {
        // normalize to sorted value rows (unordered shapes have no
        // deterministic row order)
        Right(f.map(_.toSeq).toSeq.sortBy(_.mkString("|")))
      } catch {
        case e: Throwable =>
          val s = e.toString + Option(e.getCause).map(_.toString).getOrElse("")
          assert(s.contains("ErrorLimitExceeded"),
            s"$label unexpected failure: $e")
          Left("limit_exceeded")
      }
    (0 until 30).foreach { i =>
      val groups = rnd.shuffle(grpCols).take(1 + rnd.nextInt(2))
      val nAgg = 1 + rnd.nextInt(2)
      val aggSqls = scala.collection.mutable.ArrayBuffer.empty[String]
      val aggCols = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Column]
      (0 until nAgg).foreach { j =>
        val c = numCols(rnd.nextInt(numCols.length))
        rnd.nextInt(3) match {
          case 0 => aggSqls += s"sum($c) AS a$j"; aggCols += sum(col(c)).alias(s"a$j")
          case 1 => aggSqls += s"avg($c) AS a$j"; aggCols += avg(col(c)).alias(s"a$j")
          case 2 => aggSqls += s"count(*) AS a$j"; aggCols += count(lit(1)).alias(s"a$j")
        }
        rnd.nextInt(3) match {
          case 0 =>
            aggSqls += s"absolute_error(a$j) AS e$j"
            aggCols += functions.absolute_error(s"a$j").alias(s"e$j")
          case 1 =>
            aggSqls += s"relative_error(a$j) AS e$j"
            aggCols += functions.relative_error(s"a$j").alias(s"e$j")
          case 2 =>
            aggSqls += s"upper_bound(a$j) AS e$j"
            aggCols += functions.upper_bound(s"a$j").alias(s"e$j")
        }
      }
      // TOTAL orderings only (all group columns, possibly after a0): a
      // partial sort with a LIMIT cutting inside a tie would make the two
      // paths legitimately return different tie rows (same hazard
      // genQuery's ORDER BY documents)
      val orderSpec: Option[(String, Seq[org.apache.spark.sql.Column])] =
        rnd.nextInt(3) match {
          case 0 => None
          case 1 => Some((groups.mkString(", "), groups.map(col)))
          case 2 => Some((("a0" +: groups).mkString(", "),
            col("a0") +: groups.map(col)))
        }
      val limitN = if (orderSpec.nonEmpty && rnd.nextBoolean()) Some(1 + rnd.nextInt(3)) else None
      val behavior = Seq("do_nothing", "local_omit", "run_on_full_table",
        "strict")(rnd.nextInt(4))
      val err = Seq(0.9, 0.5, 0.05, 0.001)(rnd.nextInt(4))

      val sql =
        s"SELECT ${groups.mkString(", ")}, ${aggSqls.mkString(", ")} FROM li_fz2 " +
          s"GROUP BY ${groups.mkString(", ")}" +
          orderSpec.map(o => s" ORDER BY ${o._1}").getOrElse("") +
          limitN.map(n => s" LIMIT $n").getOrElse("") +
          s" WITH ERROR $err CONFIDENCE 0.95 BEHAVIOR '$behavior'"
      var df = li.groupBy(groups.map(col): _*).agg(aggCols.head, aggCols.tail.toSeq: _*)
      orderSpec.foreach { o => df = df.orderBy(o._2: _*) }
      limitN.foreach { n => df = df.limit(n) }

      val sqlOut = runToOutcome(s"query $i sql=$sql")(gs.sql(sql).collect())
      val dfOut = runToOutcome(s"query $i df")(df.withError(err, 0.95, behavior).collect())
      (sqlOut, dfOut) match {
        case (Right(a), Right(b)) =>
          assert(a.length === b.length, s"query $i row count: $sql")
          a.zip(b).foreach { case (ra, rb) =>
            ra.zip(rb).foreach {
              case (x: Double, y: Double) =>
                assert((x.isNaN && y.isNaN) ||
                  math.abs(x - y) <= math.max(1e-9, math.abs(y) * 1e-12),
                  s"query $i: $x vs $y\n$sql")
              case (x, y) => assert(x === y, s"query $i: $x vs $y\n$sql")
            }
          }
          // error cells sit at groups.size + 2j + 1 (each aggregate is
          // followed by its error function)
          (0 until nAgg).foreach { j =>
            val idx = groups.size + 2 * j + 1
            if (a.exists(_(idx) match {
              case d: Double => d != 0.0 && !d.isNaN
              case _ => false
            })) sawNonzeroError = true
          }
        case (a, b) =>
          assert(a === b, s"query $i outcomes diverge (sql=$a df=$b): $sql")
      }
    }
    // effectiveness guard: at fraction 0.3 the sweep must actually visit
    // nonzero errors — an all-exact run (e.g. a full-fraction sample
    // silently outranking ours again) would pass every comparison while
    // testing nothing
    assert(sawNonzeroError, "sweep never saw a nonzero error — wrong sample?")
    // deterministic coda (the random budgets rarely land below the ~0.3%
    // relative errors a 30% sample produces): an impossible strict budget
    // must throw the SAME outcome on both paths
    val strictSql = runToOutcome("strict coda sql")(gs.sql(
      "SELECT l_returnflag, sum(l_quantity) AS a0, relative_error(a0) AS e0 " +
        "FROM li_fz2 GROUP BY l_returnflag " +
        "WITH ERROR 0.0000001 CONFIDENCE 0.95 BEHAVIOR 'strict'").collect())
    val strictDf = runToOutcome("strict coda df")(
      li.groupBy("l_returnflag")
        .agg(sum(col("l_quantity")).alias("a0"),
          functions.relative_error("a0").alias("e0"))
        .withError(0.0000001, 0.95, "strict").collect())
    assert(strictSql === Left("limit_exceeded") && strictDf === Left("limit_exceeded"),
      s"both entry points must throw on an impossible strict budget: " +
        s"sql=$strictSql df=$strictDf")
    new GraftSession(spark).dropSampleTable("li_fz2_s3")
  }
}
