package graft.perf

import org.apache.spark.sql.SparkSession

/** r13 verdict #8 probe: partial-routing HAC with an adversarial error
 * limit over a HIGH-cardinality GROUP BY — every group fails the limit,
 * so the failing-key set is the full group count. The verdict's premise
 * was "failing group keys are collected to the driver (bounded by
 * failing-group count)"; the shipped code routes them as an RDD-backed
 * DataFrame into a left-semi join instead (HacExec.scala:126-148 — "the
 * failing-key set never lands on the driver"), so the probe's job is to
 * (a) demonstrate the worst case runs at full group cardinality without
 * driver materialization, and (b) record the failing-group volume and
 * wall time at a scaled input for the addendum.
 *
 * Usage: Test/runMain graft.perf.HacPartialVolumeProbe [sfDir] [groupCol]
 */
object HacPartialVolumeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // l_partkey: the highest-cardinality lineitem key in the bench data
    val groupCol = if (args.length > 1) args(1) else "l_partkey"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = graft.GraftSession(spark)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.createOrReplaceTempView("li_hacprobe")
    val groups = li.select(groupCol).distinct().count()
    gs.sql("CREATE SAMPLE TABLE IF NOT EXISTS li_hacprobe_sample ON " +
      s"li_hacprobe OPTIONS(qcs '$groupCol', fraction '0.05')")
    // WITH ERROR 1e-9: no sampled group meets the limit -> ALL groups fail
    // and route to the base table through the semi-join
    val t0 = System.nanoTime()
    val df = gs.sql(
      s"""SELECT $groupCol, round(sum(l_extendedprice), 2) AS sum_price
         |FROM li_hacprobe GROUP BY $groupCol
         |WITH ERROR 0.000000001 BEHAVIOR 'partial_run_on_base_table'"""
        .stripMargin)
    val rows = df.count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"HACPROBE sf=$sfDir group=$groupCol groups=$groups " +
      f"rows=$rows wall=$wall%.2f s")
    // NOTE the semi-join runs INSIDE HacExec.doExecute (a nested
    // queryExecution), so it is not visible in this outer plan string —
    // the no-driver-collection property is structural
    // (HacExec.scala:126-148) and this probe's evidence is the run itself:
    // full-cardinality failing-key volume completing at scale.
    println("HACPROBE outer plan head: " +
      df.queryExecution.executedPlan.toString.linesIterator.take(3)
        .mkString(" | "))
    spark.stop()
  }
}
