package graft.perf

import java.lang.management.ManagementFactory

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Root-cause probe for q27's same-code sf0.1 bimodality (r13 verdict
 * "what's wrong #4": 0.91–1.42 s across clean runs whose diffs never touch
 * its code path). Runs the q27 gate repeatedly in ONE JVM and, per run,
 * records wall time, the FINAL (post-AQE) executed-plan signature, and the
 * JVM's GC/JIT time deltas — separating the two hypotheses the verdict
 * names: an AQE plan flip in the candidate join (plan signatures differ
 * between fast and slow runs) vs session JIT/GC noise (signatures equal,
 * slow runs correlate with compilation/GC time).
 *
 * Usage: Test/runMain graft.perf.Q27Probe [sfDir] [runs]
 */
object Q27Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def gcMs: Long = ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
    def jitMs: Long = ManagementFactory.getCompilationMXBean.getTotalCompilationTime
    val planSigs = scala.collection.mutable.Map.empty[Int, String]
    for (i <- 1 to runs) {
      val gc0 = gcMs; val jit0 = jitMs
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries("q27_ngram_jaccard")(spark, sfDir)
      val n = df.count()
      val wall = (System.nanoTime() - t0) / 1e9
      // post-execution the AQE plan is final; normalize away ids
      val plan = df.queryExecution.executedPlan.toString
        .replaceAll("#\\d+", "#x").replaceAll("plan_id=\\d+", "plan_id=x")
        .replaceAll("\\[id=#?x?\\d*\\]", "")
      val sig = plan.hashCode
      planSigs.getOrElseUpdate(sig, plan)
      println(f"RUN $i%2d wall=$wall%6.3f s rows=$n gc=+${gcMs - gc0}%4d ms " +
        f"jit=+${jitMs - jit0}%5d ms plan=$sig%x")
    }
    println(s"DISTINCT PLANS: ${planSigs.size}")
    if (planSigs.size > 1) {
      planSigs.zipWithIndex.foreach { case ((sig, plan), i) =>
        println(s"--- plan variant $i (sig=$sig) head:")
        println(plan.linesIterator.take(25).mkString("\n"))
      }
    }
    spark.stop()
  }
}
