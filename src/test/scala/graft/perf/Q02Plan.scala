package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan check for the sampler's 60M-row broadcast join. */
object Q02Plan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10u")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_partkey",
        "l_suppkey")
    val keyed = li.withColumn("__k", col("l_returnflag"))
    val counts = keyed.groupBy(col("__k")).agg(count(lit(1)).as("__tot"))
    val j = keyed.join(broadcast(counts.withColumnRenamed("__k", "__kc")),
      col("__k") <=> col("__kc"), "inner")
    j.explain("formatted")
  }
}
