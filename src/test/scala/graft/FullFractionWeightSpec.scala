package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._
import graft.sampling.StratifiedSampler

/**
 * The full-fraction (fraction >= 1.0) sampler's sentinel weight
 * (pack(1, 1, keyHash) instead of pack(total, total, keyHash)): every
 * consumer of the packed weight is invariant when kept == total — the
 * decoded HT ratio is exactly 1.0 either way, the closed-form FPC factor
 * contributes exactly 0 either way — so dropping the per-stratum totals
 * pass (a full extra scan of the base per query) changes NO query output.
 * These legs pin that invariance end to end against the classic plan.
 */
class FullFractionWeightSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")

  private def withSentinel[T](mode: String)(body: => T): T = {
    val k = "spark.graft.sampler.fullFractionSentinel"
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, mode)
    try body finally prev match {
      case Some(p) => spark.conf.set(k, p)
      case None => spark.conf.unset(k)
    }
  }

  private def collectSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("decoded weight is exactly 1.0 for every full-fraction row") {
    val s = StratifiedSampler.sample(li, Seq("l_returnflag"), fraction = 1.0)
    val ws = s.select(sample_weight).distinct().collect().map(_.getDouble(0))
    assert(ws.toSeq === Seq(1.0))
    assert(s.count() === li.count())
  }

  test("weighted aggregates identical: sentinel vs classic totals join") {
    def run(): Set[Seq[Any]] = collectSet(
      StratifiedSampler.sample(li, Seq("l_returnflag"), fraction = 1.0)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(round(weighted_sum(col("l_quantity")), 4).as("s"),
          round(weighted_avg(col("l_extendedprice")), 6).as("a"),
          round(weighted_count(col("l_quantity")), 4).as("c")))
    val sentinel = withSentinel("on")(run())
    val classic = withSentinel("off")(run())
    assert(sentinel === classic)
    assert(sentinel.nonEmpty)
  }

  test("closed-form struct identical: estimates, bounds, errors, sample_count") {
    def run(): Set[Seq[Any]] = collectSet(
      StratifiedSampler.sample(li, Seq("l_returnflag"), fraction = 1.0)
        .groupBy(col("l_returnflag"))
        .agg(approx_sum(col("l_quantity"), col(weightColumn)).as("s"),
          approx_avg(col("l_extendedprice"), col(weightColumn)).as("a"),
          approx_count(col("l_quantity"), col(weightColumn)).as("c"))
        .select(col("l_returnflag"), col("s.*"), col("a.estimate"),
          col("c.estimate"), col("c.sample_count")))
    val sentinel = withSentinel("on")(run())
    val classic = withSentinel("off")(run())
    assert(sentinel === classic)
    // full fraction: FPC zeroes the variance — errors exactly 0
    sentinel.foreach { row =>
      assert(row(4) === 0.0, s"absolute_error must be exactly 0: $row")
    }
  }

  test("single-row strata (L == R == 1): NaN-skip edge matches the classic 0") {
    // every stratum has exactly one row — mulFactor is 0/0 = NaN on the
    // sentinel AND classic encodings alike at R = 1... classic packs
    // (1, 1) there too, so this pins the shared edge explicitly
    val one = (1 to 8).map(i => (s"k$i", i.toDouble)).toDF("k", "v")
    def run(): Set[Seq[Any]] = collectSet(
      StratifiedSampler.sample(one, Seq("k"), fraction = 1.0)
        .agg(approx_sum(col("v"), col(weightColumn)).as("s"))
        .select(col("s.estimate"), col("s.absolute_error"),
          col("s.sample_count")))
    val sentinel = withSentinel("on")(run())
    val classic = withSentinel("off")(run())
    assert(sentinel === classic)
    assert(sentinel.head(0) === (1 to 8).map(_.toDouble).sum)
  }

  test("bootstrap point estimates exact and CI frames them under the sentinel") {
    // the per-row bootstrap seed hashes the FULL sample row including the
    // weight column, so the sentinel legitimately re-seeds the Poisson
    // draws of a full-fraction bootstrap — the pinned contract is the
    // DECLARED one (q30): trial 0 (the point estimate) is exact at full
    // fraction, and the quantile CI frames it
    def run(): Seq[org.apache.spark.sql.Row] = {
      val k = "spark.sql.aqp.estimator"
      val prev = spark.conf.getOption(k)
      spark.conf.set(k, "bootstrap")
      try {
        val gs = GraftSession(spark)
        li.createOrReplaceTempView("li_ffw_bs")
        gs.sql("DROP SAMPLE TABLE IF EXISTS li_ffw_bs_sample")
        gs.sql("CREATE SAMPLE TABLE li_ffw_bs_sample ON li_ffw_bs " +
          "OPTIONS(qcs 'l_returnflag', fraction '1.0')")
        gs.sql(
          """SELECT l_returnflag, round(sum(l_quantity), 4) AS s,
            |  (lower_bound(s) <= s AND s <= upper_bound(s)) AS ci_ok
            |FROM li_ffw_bs GROUP BY l_returnflag ORDER BY l_returnflag
            |WITH ERROR 0.9 CONFIDENCE 0.95""".stripMargin).collect().toSeq
      } finally {
        prev match {
          case Some(p) => spark.conf.set(k, p)
          case None => spark.conf.unset(k)
        }
      }
    }
    val sentinel = withSentinel("on")(run())
    val classic = withSentinel("off")(run())
    // point estimates (trial 0) are seed-independent: identical
    assert(sentinel.map(r => (r.getString(0), r.getDouble(1)))
      === classic.map(r => (r.getString(0), r.getDouble(1))))
    // CI frames the estimate in both draw streams
    (sentinel ++ classic).foreach(r => assert(r.getBoolean(2), r.toString))
  }

  test("full-fraction sample plan has no extra scan, no join, no exchange") {
    val plan = withSentinel("on") {
      StratifiedSampler.sample(li, Seq("l_returnflag"), fraction = 1.0)
        .queryExecution.executedPlan.toString
    }
    assert(!plan.contains("Join"), s"sentinel plan must not join:\n$plan")
    assert(!plan.contains("Exchange"),
      s"sentinel plan must not shuffle or broadcast:\n$plan")
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans === 1, s"sentinel plan must scan the base exactly once:\n$plan")
  }
}
