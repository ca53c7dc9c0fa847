package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Generator for the dims-outgrow-broadcast probe corpus (BENCH_sf1):
 * every fact table of `srcSfDir` is reused as-is (symlinked by the
 * caller), while `orders` and `customer` are replicated `reps`× with
 * keys remapped OUT of the fact tables' key range for replicas ≥ 1 —
 * replica 0 keeps the original keys, so inner joins against facts return
 * IDENTICAL results while the dim itself grows past any broadcast
 * threshold (15M orders ≈ hundreds of MB: the regime where the join must
 * flip to a shuffle join, not OOM the driver on a broadcast).
 *
 * Usage: Test/runMain graft.perf.DimsScaleGen <outDir> [reps] [srcSfDir]
 */
object DimsScaleGen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/dims100")
    val reps = if (args.length > 1) args(1).toInt else 100
    val src = if (args.length > 2) args(2) else "/tmp/sf1u"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def grow(table: String, key: String): Unit = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      spark.range(reps).select(col("id").as("rep"))
        .crossJoin(broadcast(base))
        .withColumn(key, when(col("rep") === 0, col(key))
          .otherwise(col("rep") * lit(1000000000L) + col(key)))
        .drop("rep")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"GEN $out/$table: " +
        spark.read.parquet(s"$out/$table.parquet").count() + " rows")
    }
    grow("orders", "o_orderkey")
    grow("customer", "c_custkey")
    spark.stop()
  }
}
