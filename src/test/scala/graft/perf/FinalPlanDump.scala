package graft.perf

import org.apache.spark.sql.SparkSession

/** Execute named gate queries and print the AQE FINAL physical plan —
  * the static Explain shows isFinalPlan=false, which hides runtime
  * SMJ→BHJ conversions and coalesced reads (r16 measurement tooling). */
object FinalPlanDump {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.queryExecution.toRdd.count() // execute THIS plan so AQE finalizes
      println(s"===== $name (final) =====")
      // executedPlan after execution reflects the final adaptive plan
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
