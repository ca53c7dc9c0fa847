package graft.perf

import java.lang.management.ManagementFactory

import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** The cluster-faithful decade-point runner (r15 verdict next-round #7):
 * the BENCH_sf1 addendum-14 lesson — shuffle partitions and heap scale
 * with the corpus, the small-sf bench envelope does NOT — promoted from
 * prose to one command, so every future decade measurement separates
 * "the operator hit a wall" from "the box recipe was wrong"
 * mechanically instead of by OOM forensics.
 *
 *  - `spark.sql.shuffle.partitions` derives from the gate's on-disk
 *    corpus bytes at ~32 MB of source parquet per partition (pow2-
 *    rounded, floor 32): 50M docs (9.1 GB) resolves to 256 — the
 *    measured recipe that took q11's fourth decade from two OOM
 *    classes (reduce-side SMJ sort buffers, then map-side shuffle
 *    writers) to a linear 477–520 s; sf-gate corpora stay at the
 *    bench's own 32.
 *  - heap headroom is ASSERTED up front (≥ 4 GB per GB of corpus,
 *    floor 8 GB — the 48 GB recipe at 9.1 GB): a JVM that would die
 *    mid-run in shuffle-writer buffers fails in one line naming
 *    `SPARK_DRIVER_MEM` instead.
 *  - ≥3 passes with the FIRST DISCARDED (the GateVarianceProbe JIT
 *    attribution: run-1 carries up to +67 s of compilation at sf10u),
 *    reporting per-run wall/gc/jit/io/plan-signature and the median of
 *    the kept passes.
 *
 * Usage: Test/runMain graft.perf.DecadeRun <gate> <sfDir> [passes≥3]
 */
object DecadeRun {
  private def procIoReadBytes: Long = try {
    scala.io.Source.fromFile("/proc/self/io").getLines()
      .collectFirst { case l if l.startsWith("read_bytes:") =>
        l.split(":")(1).trim.toLong }.getOrElse(-1L)
  } catch { case _: Exception => -1L }

  /** Pow2-rounded partition count for `corpusBytes` at ~32 MB of source
   * parquet per partition, floored at the bench envelope's 32. */
  private[perf] def derivePartitions(corpusBytes: Long): Int = {
    val want = corpusBytes.toDouble / (32L << 20).toDouble
    val pow2 = math.pow(2.0,
      math.round(math.log(math.max(want, 1.0)) / math.log(2.0)).toDouble)
    math.max(32, pow2.toInt)
  }

  /** Minimum heap for the corpus: 4 GB per GB of source parquet,
   * floor 8 GB (the measured 50M-doc recipe: 9.1 GB → 48 GB ≥ 36.4). */
  private[perf] def minHeapBytes(corpusBytes: Long): Long =
    math.max(8L << 30, corpusBytes * 4)

  private def dirBytes(path: java.io.File): Long =
    if (path.isFile) path.length()
    else Option(path.listFiles()).map(_.map(dirBytes).sum).getOrElse(0L)

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DecadeRun <gate> <sfDir> [passes>=3]")
    val gate = args(0)
    val sfDir = args(1)
    val passes = if (args.length > 2) math.max(3, args(2).toInt) else 3
    val corpusBytes = dirBytes(new java.io.File(sfDir))
    val parts = derivePartitions(corpusBytes)
    val needHeap = minHeapBytes(corpusBytes)
    val heap = Runtime.getRuntime.maxMemory
    require(heap >= needHeap * 9 / 10, // -Xmx48g reads back slightly low
      f"DecadeRun: heap ${heap / (1L << 30)} GB < required " +
        f"${needHeap / (1L << 30)} GB for a ${corpusBytes / (1L << 30)} GB " +
        "corpus — relaunch with SPARK_DRIVER_MEM=" +
        f"${(needHeap >> 30) + 1}g (shuffle-writer buffers scale with " +
        "partitions x concurrent tasks; an undersized heap dies mid-run)")
    println(s"DECADE gate=$gate sfDir=$sfDir corpus=" +
      f"${corpusBytes / 1e9}%.1f GB partitions=$parts " +
      f"heap=${heap / (1L << 30)} GB passes=$passes (first discarded)")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def gcMs: Long = ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
    def jitMs: Long =
      ManagementFactory.getCompilationMXBean.getTotalCompilationTime
    val walls = scala.collection.mutable.ArrayBuffer.empty[Double]
    val planSigs = scala.collection.mutable.Set.empty[Int]
    for (i <- 1 to passes) {
      val gc0 = gcMs; val jit0 = jitMs; val io0 = procIoReadBytes
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(gate)(spark, sfDir)
      val n = df.count()
      val wall = (System.nanoTime() - t0) / 1e9
      if (i > 1) walls += wall
      val sig = df.queryExecution.executedPlan.toString
        .replaceAll("#\\d+", "#x").replaceAll("plan_id=\\d+", "plan_id=x")
        .replaceAll("\\[id=#?x?\\d*\\]", "").hashCode
      planSigs += sig
      println(f"RUN $i%2d wall=$wall%8.1f s rows=$n gc=+${gcMs - gc0}%6d ms " +
        f"jit=+${jitMs - jit0}%6d ms " +
        f"io=+${(procIoReadBytes - io0) / (1 << 20)}%6d MB plan=$sig%x" +
        (if (i == 1) "  [discarded: JIT pass]" else ""))
    }
    val sorted = walls.sorted
    println(f"DECADE RESULT gate=$gate median=${sorted(sorted.size / 2)}%.1f s" +
      f" of ${walls.size} kept passes (min=${sorted.head}%.1f " +
      f"max=${sorted.last}%.1f) distinctPlans=${planSigs.size}")
    spark.stop()
  }
}
