package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe for the BENCH_sf1 simhash-radius note: times
 * `simhashPairs` at a given Hamming radius over a scale corpus's
 * documents table. The d ≤ 3 points were measured in round 12 (Manku
 * block-permutation rebuild); this probe covers the d = 4/5 points that
 * round 13 moved from the narrow-key pigeonhole fallback (keys of
 * 64/(d+1) bits — n²/2^12.8 random candidates at d = 4, WORSE than the
 * 16-bit chunking the r12 fix cured) onto wide-key blocking
 * (d = 4: C(8,4) = 70 tables of 32-bit keys; d = 5: C(8,3) = 56 tables
 * of 24-bit keys).
 *
 * Usage: Test/runMain graft.perf.SimhashRadiusProbe <sfDir> [d] [passes]
 */
object SimhashRadiusProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val d = if (args.length > 1) args(1).toInt else 4
    val passes = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    var pairs = 0L
    def once(): Double = {
      val t0 = System.nanoTime()
      pairs = graft.dedup.Dedup.simhashPairs(docs, "doc_id", "text",
        maxHamming = d).count()
      (System.nanoTime() - t0) / 1e9
    }
    if (passes > 1) once() // warmup
    val ts = (1 to passes).map(_ => once()).sorted
    println(f"PROBE sf=$sfDir d=$d median=${ts(ts.size / 2)}%.2fs pairs=$pairs")
    spark.stop()
  }
}
