package graft.perf

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan auditor: prints the formatted physical plan of selected gate
  * queries so scan pruning (ReadSchema), PushedFilters, broadcast-join
  * choices and WholeStageCodegen spans can be eyeballed at the bench scale.
  * `runMain graft.perf.PlanAudit [queryName ...]` — no args = a fixed
  * representative set. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_weighted_agg", "q17_join_with_error", "q47_repetition",
        "q48_pii", "q09_text_stats")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      println(s"\n===================== $n =====================")
      println(fn(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
