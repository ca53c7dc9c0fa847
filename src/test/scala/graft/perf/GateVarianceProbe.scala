package graft.perf

import java.lang.management.ManagementFactory

import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** The Q27Probe shape generalized to ANY gate (r14 verdict next-round #3:
 * attribute q33's ±40% same-data sf10u spread). Runs one gate repeatedly
 * in ONE JVM and, per run, records wall time, the final post-AQE plan
 * signature, the JVM's GC/JIT deltas, AND the process's real
 * block-device read bytes (`/proc/self/io read_bytes` — the page-cache
 * signal the q27 probe lacked: at sf10u the corpus no longer fits
 * comfortably alongside shuffle spill, so cold-read variance is a live
 * hypothesis alongside JIT and plan flips).
 *
 *  - plan signatures differ between fast/slow → AQE plan flip;
 *  - signatures equal, slow runs track jit+gc → session JIT/GC (q27's
 *    verdict: raise pass counts);
 *  - signatures equal, slow runs track read_bytes → page cache / disk.
 *
 * Usage: Test/runMain graft.perf.GateVarianceProbe <gate> [sfDir] [runs]
 *        [shufflePartitions] — the last one matters at decade points:
 *        32 partitions over 800M banded rows (50M docs) is 25M rows per
 *        task and breaches the per-task memory envelope that a real
 *        cluster would never see; scale it with the data like a cluster
 *        would.
 */
object GateVarianceProbe {
  private def procIoReadBytes: Long = try {
    scala.io.Source.fromFile("/proc/self/io").getLines()
      .collectFirst { case l if l.startsWith("read_bytes:") =>
        l.split(":")(1).trim.toLong }.getOrElse(-1L)
  } catch { case _: Exception => -1L }

  def main(args: Array[String]): Unit = {
    val gate = args.headOption.getOrElse("q33_dedup_clusters")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 10
    val parts = if (args.length > 3) args(3) else "32"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def gcMs: Long = ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
    def jitMs: Long =
      ManagementFactory.getCompilationMXBean.getTotalCompilationTime
    val planSigs = scala.collection.mutable.Map.empty[Int, String]
    for (i <- 1 to runs) {
      val gc0 = gcMs; val jit0 = jitMs; val io0 = procIoReadBytes
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(gate)(spark, sfDir)
      val n = df.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan.toString
        .replaceAll("#\\d+", "#x").replaceAll("plan_id=\\d+", "plan_id=x")
        .replaceAll("\\[id=#?x?\\d*\\]", "")
      val sig = plan.hashCode
      planSigs.getOrElseUpdate(sig, plan)
      println(f"RUN $i%2d wall=$wall%7.3f s rows=$n gc=+${gcMs - gc0}%5d ms " +
        f"jit=+${jitMs - jit0}%6d ms io=+${(procIoReadBytes - io0) / (1 << 20)}%6d MB " +
        f"plan=$sig%x")
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
