package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * Self-consistency fuzz of HAC enforcement (reference `AQPRules.scala`
 * post-pass; this repo's `HacExec` + local-omit finalizer): for random
 * (measure, aggregate, group, predicate) shapes, the DO_NOTHING run's own
 * reported `relative_error` values must PREDICT every other behavior's
 * observable outcome at error limits chosen strictly between the observed
 * error values:
 *
 *  - STRICT throws iff some group's error exceeds the limit, else answers
 *    exactly the DO_NOTHING values;
 *  - RUN_ON_FULL_TABLE answers the exact base values iff some group
 *    exceeds, else the DO_NOTHING values;
 *  - PARTIAL_RUN_ON_BASE_TABLE answers exact base values for precisely
 *    the exceeding groups and DO_NOTHING values for the rest;
 *  - LOCAL_OMIT nulls precisely the exceeding groups' aggregates.
 *
 * Determinism: the sampler and bootstrap seeds are content-hashed, so the
 * same query re-runs identically and cross-behavior equality is exact.
 */
class HacContractFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._

  private lazy val gs: GraftSession = {
    val g = new GraftSession(spark)
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li_hac")
    g.sql("CREATE SAMPLE TABLE li_hac_s ON li_hac OPTIONS(" +
      "qcs 'l_returnflag', fraction '0.05', strataReservoirSize '10')")
    g
  }

  override def afterAll(): Unit = {
    new GraftSession(TestSpark.spark).dropSampleTable("li_hac_s")
    super.afterAll()
  }

  private def num(v: Any): Double = v match {
    case null => Double.NaN
    case d: java.math.BigDecimal => d.doubleValue()
    case n: Number => n.doubleValue()
  }

  private def close(a: Double, b: Double): Boolean =
    (a.isNaN && b.isNaN) || math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(b))

  for (seed <- 1 to 3)
  test(s"HAC behaviors consistent with do_nothing's own error report, seed $seed") {
    val rnd = new scala.util.Random(500 + seed)
    (1 to 3).foreach { scenarioNo =>
      val measure = Seq("l_quantity", "l_extendedprice")(rnd.nextInt(2))
      val aggExpr = Seq(s"sum($measure)", s"avg($measure)", "count(*)")(rnd.nextInt(3))
      val group = Seq("l_linestatus", "l_returnflag")(rnd.nextInt(2))
      val pred = Seq("", "WHERE l_partkey % 3 = 0", "WHERE l_quantity > 10")(rnd.nextInt(3))
      def q(clause: String): String =
        s"""SELECT $group AS g, $aggExpr AS x, relative_error(x) AS re
           |FROM li_hac $pred GROUP BY $group $clause""".stripMargin

      val exact = gs.sql(
        s"SELECT $group AS g, $aggExpr AS x FROM li_hac $pred GROUP BY $group")
        .collect().map(r => r.getString(0) -> num(r.get(1))).toMap
      val dn = gs.sql(q("WITH ERROR 0.5 BEHAVIOR 'do_nothing'"))
        .collect().map(r => (r.getString(0), num(r.get(1)), num(r.get(2))))
      assert(dn.nonEmpty)
      val res = dn.map(_._3)
      // limits strictly between observed error values (plus one below and
      // one above), all inside (0,1)
      val distinct = res.distinct.sorted.toSeq
      val candidates =
        (distinct.headOption.map(_ / 2).toSeq ++
          distinct.sliding(2).filter(_.size == 2).map(p => (p(0) + p(1)) / 2).toSeq ++
          Seq(distinct.lastOption.map(m => m * 1.5 + 0.01).getOrElse(0.5)))
          .map(l => math.min(0.999999, math.max(1e-9, l)))
          .filter(l => !distinct.contains(l))
          .distinct
      candidates.foreach { limit =>
        val failing = dn.filter(_._3 > limit).map(_._1).toSet
        val scenario = s"seed=$seed#$scenarioNo agg=$aggExpr grp=$group " +
          s"pred='$pred' limit=$limit failing=${failing.size}/${dn.size}"

        // STRICT
        val strictOutcome =
          try Right(gs.sql(q(s"WITH ERROR $limit BEHAVIOR 'strict'")).collect())
          catch { case t: Throwable => Left(t) }
        strictOutcome match {
          case Left(t) =>
            assert(failing.nonEmpty, s"$scenario: strict threw with no failing group: $t")
          case Right(rows) =>
            assert(failing.isEmpty, s"$scenario: strict did NOT throw")
            assert(rows.map(r => r.getString(0) -> num(r.get(1))).toMap ===
              dn.map(t => t._1 -> t._2).toMap.transform((_, v) => v))
        }

        // RUN_ON_FULL_TABLE
        val reroute = gs.sql(q(s"WITH ERROR $limit BEHAVIOR 'run_on_full_table'"))
          .collect().map(r => r.getString(0) -> num(r.get(1))).toMap
        if (failing.nonEmpty) {
          assert(reroute.keySet === exact.keySet, s"$scenario: reroute keys")
          exact.foreach { case (k, v) =>
            assert(close(reroute(k), v), s"$scenario: reroute $k ${reroute(k)} != exact $v")
          }
        } else {
          dn.foreach { case (k, v, _) =>
            assert(close(reroute(k), v), s"$scenario: no-fail reroute $k changed")
          }
        }

        // PARTIAL
        val partial = gs.sql(q(s"WITH ERROR $limit BEHAVIOR 'partial_run_on_base_table'"))
          .collect().map(r => r.getString(0) -> num(r.get(1))).toMap
        dn.foreach { case (k, v, _) =>
          val want = if (failing(k)) exact(k) else v
          assert(close(partial(k), want),
            s"$scenario: partial $k got ${partial(k)} want $want (failing=${failing(k)})")
        }

        // LOCAL_OMIT: exceeding groups' aggregates null — except Count,
        // which carries the reference's -1 omission marker
        val omit = gs.sql(q(s"WITH ERROR $limit BEHAVIOR 'local_omit'"))
          .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) None
            else Some(num(r.get(1))))).toMap
        dn.foreach { case (k, v, _) =>
          omit(k) match {
            case None => assert(failing(k), s"$scenario: local_omit nulled passing $k")
            case Some(got) if aggExpr == "count(*)" && got == -1.0 =>
              assert(failing(k), s"$scenario: local_omit marked passing $k")
            case Some(got) =>
              assert(!failing(k), s"$scenario: local_omit kept failing $k")
              assert(close(got, v), s"$scenario: local_omit changed passing $k")
          }
        }
      }
    }
  }
}
