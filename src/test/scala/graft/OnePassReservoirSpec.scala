package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sampling.StratifiedSampler

/** Parity of the one-pass bounded-reservoir plan (fraction == 0,
 * `spark.graft.sampler.onePassReservoir`, r16) against the classic
 * two-pass totals+prefilter+rank-window plan: the selection criterion is
 * identical (the reservoirSize smallest full-width content hashes per
 * stratum), so the sampled multiset and every decoded weight must match
 * exactly — including under duplicate rows (hash ties straddling the
 * reservoir boundary), NULL stratum keys, and strata smaller than the
 * reservoir. */
class OnePassReservoirSpec extends AnyFunSuite {
  import TestSpark._

  private def sampleWith(df: DataFrame, qcs: Seq[String], n: Int,
      mode: String): DataFrame = {
    spark.conf.set("spark.graft.sampler.onePassReservoir", mode)
    try StratifiedSampler.sample(df, qcs, fraction = 0.0, reservoirSize = n)
    finally spark.conf.set("spark.graft.sampler.onePassReservoir", "on")
  }

  /** Multiset of full rows (weight column included, decoded). */
  private def multiset(df: DataFrame): Map[String, Long] = {
    val cols = df.columns.toSeq
    df.select(to_json(struct(cols.map(col): _*)).as("j"))
      .groupBy("j").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("one-pass == classic on a distinct-row corpus (multiset + weights)") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val on = sampleWith(li, Seq("l_returnflag", "l_linestatus"), 25, "on")
    val off = sampleWith(li, Seq("l_returnflag", "l_linestatus"), 25, "off")
    assert(multiset(on) == multiset(off))
  }

  test("plan shape: one-pass has no window and one exchange") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val on = sampleWith(li, Seq("l_returnflag"), 10, "on")
    val plan = on.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"one-pass plan must not sort-window:\n$plan")
    val off = sampleWith(li, Seq("l_returnflag"), 10, "off")
    assert(off.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("duplicate rows: ties at the reservoir boundary keep the same multiset") {
    import spark.implicits._
    // 3 distinct values, each replicated 7x, in a single stratum with
    // reservoir 10: the kept set MUST contain a tie group split at the
    // boundary (10 = 7 + 3 of the next tie group)
    val df = (0 until 3).flatMap(v => Seq.fill(7)(("s", v))).toDF("k", "v")
      .repartition(4)
    val on = sampleWith(df, Seq("k"), 10, "on")
    val off = sampleWith(df, Seq("k"), 10, "off")
    assert(on.count() == 10 && off.count() == 10)
    assert(multiset(on) == multiset(off))
  }

  test("NULL stratum keys and sub-reservoir strata match classic") {
    import spark.implicits._
    val df = Seq(
      (null.asInstanceOf[String], 1L), (null.asInstanceOf[String], 2L),
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 5L),
      ("b", 10L)).toDF("k", "v").repartition(3)
    val on = sampleWith(df, Seq("k"), 3, "on")
    val off = sampleWith(df, Seq("k"), 3, "off")
    assert(multiset(on) == multiset(off))
    // sub-reservoir strata keep everything with weight 1
    val wOn = on.filter(col("k") === "b")
      .select(graft.functions.weighted_count(col("v")).as("w"))
    assert(wOn.collect().head.getDouble(0) == 1.0)
  }

  test("weights decode to total/kept in both plans") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    def est(df: DataFrame): Map[String, Double] =
      df.groupBy("l_returnflag")
        .agg(round(graft.functions.weighted_count(col("l_returnflag")), 6)
          .as("est"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val on = est(sampleWith(li, Seq("l_returnflag"), 25, "on"))
    val off = est(sampleWith(li, Seq("l_returnflag"), 25, "off"))
    assert(on == off)
  }
}
