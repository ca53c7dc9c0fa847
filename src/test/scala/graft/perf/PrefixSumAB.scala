package graft.perf

import org.apache.spark.sql.SparkSession

/** In-JVM A/B of the r16 scale-adaptive prefixSum bucket count on the
  * q52 gate: bucketBytes=1 forces the caller-ceiling (old 64-bucket)
  * behavior; default resolves from input stats. */
object PrefixSumAB {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries("q52_token_budget_select")
    fn(spark, dir).count() // warm
    var sums = Map[String, Seq[Double]]()
    for (round <- 1 to 3; mode <- Seq("adaptive", "forced64")) {
      if (mode == "forced64")
        spark.conf.set("spark.graft.prefixSum.bucketBytes", "1")
      else spark.conf.unset("spark.graft.prefixSum.bucketBytes")
      val t0 = System.nanoTime(); val n = fn(spark, dir).count()
      val t = (System.nanoTime() - t0) / 1e9
      sums = sums.updated(mode, sums.getOrElse(mode, Nil) :+ t)
    }
    sums.foreach { case (m, ts) =>
      println(f"Q52 $m%-9s runs=${ts.map(t => f"$t%.3f").mkString(",")} " +
        f"median=${ts.sorted.apply(ts.size / 2)}%.3f")
    }
    spark.stop()
  }
}
