package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-isolation of the sampler's 8 s pre-rank cost at sf10u:
 * struct-hash vs flat-hash, string-in-hash vs not, join vs no-join.
 *
 * Usage: Test/runMain graft.perf.Q02Micro [sfDir]
 */
object Q02Micro {
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
    def timed(tag: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"Q02M $tag median=${ts(1)}%.2fs")
    }
    val ints = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    timed("hash_flat_ints") {
      li.select(xxhash64(ints.map(col): _*).as("h"))
        .filter(col("h").cast("double") < lit(-0.8 * Long.MaxValue)).count(); ()
    }
    timed("hash_struct_ints") {
      li.select(xxhash64(struct(ints.map(col): _*), lit(42L)).as("h"))
        .filter(col("h").cast("double") < lit(-0.8 * Long.MaxValue)).count(); ()
    }
    timed("hash_struct_all5") {
      li.select(xxhash64(struct(li.columns.map(col).toSeq: _*), lit(42L)).as("h"))
        .filter(col("h").cast("double") < lit(-0.8 * Long.MaxValue)).count(); ()
    }
    timed("join_only") {
      val keyed = li.withColumn("__k", col("l_returnflag"))
      val counts = keyed.groupBy(col("__k")).agg(count(lit(1)).as("__tot"))
      keyed.join(broadcast(counts.withColumnRenamed("__k", "__kc")),
        col("__k") <=> col("__kc"), "inner").count(); ()
    }
    timed("join_plus_structhash") {
      val keyed = li.withColumn("__k", col("l_returnflag"))
        .withColumn("__r", xxhash64(struct(li.columns.map(col).toSeq: _*), lit(42L)))
      val counts = keyed.groupBy(col("__k")).agg(count(lit(1)).as("__tot"))
      keyed.join(broadcast(counts.withColumnRenamed("__k", "__kc")),
        col("__k") <=> col("__kc"), "inner")
        .filter(col("__r").cast("double") < lit(-0.8 * Long.MaxValue)).count(); ()
    }
    spark.stop()
  }
}
