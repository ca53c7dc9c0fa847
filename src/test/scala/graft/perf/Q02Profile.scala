package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off decomposition of q02's linear term (the largest sf10u row,
 * 19.8 s on 60M rows): times the bare 5-column scan, the scan + rank
 * hash, the stratified sample without rank columns, and the full q02
 * configuration, to see whether the cost is the scan (nothing to win) or
 * the sampler's own machinery (something to win).
 *
 * Usage: Test/runMain graft.perf.Q02Profile [sfDir]
 */
object Q02Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10u")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_partkey",
        "l_suppkey")
    def timed(tag: String)(f: => Long): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"Q02P $tag median=${ts(1)}%.2fs")
    }
    timed("scan_count")(li.count())
    timed("scan_hash") {
      li.select(xxhash64(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey")).as("h"))
        .agg(expr("bit_xor(h)")).collect(); 0L // ANSI: sum(hash) overflows
    }
    timed("sample_norank") {
      graft.sampling.StratifiedSampler.sample(li, Seq("l_returnflag"),
        fraction = 0.1, reservoirSize = 10).count()
    }
    timed("sample_full_q02") {
      graft.sampling.StratifiedSampler.sample(li, Seq("l_returnflag"),
        fraction = 0.1, reservoirSize = 10,
        rankCols = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1))).collect(); 0L
    }
    spark.stop()
  }
}
