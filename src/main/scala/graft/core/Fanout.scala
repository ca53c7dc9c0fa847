package graft.core

import org.apache.spark.sql.DataFrame

/**
 * Round-robin fan-out for CPU-heavy per-row operators (n-gram expansion,
 * MinHash signatures, cosine scoring, decode UDFs).
 *
 * A small input — e.g. one parquet row group — arrives as a single partition,
 * serializing all downstream per-row work onto one core. Conversely a 100 TB
 * table already has tens of thousands of input splits and must NOT be
 * re-shuffled just to run a map. Policy: redistribute only when the
 * optimizer's size estimate gives each core less than `bytesPerCore` of
 * input; then the extra exchange is cheap by construction (the data is
 * small relative to the cluster), and on a big cluster it also widens a
 * medium-sized input (1 GB on 8000 cores) that would otherwise underuse it.
 * Uses plan statistics, not `df.rdd.getNumPartitions`, so no query stages
 * execute at planning time under AQE.
 */
object Fanout {

  private val bytesPerCore: Long = 4L * 1024 * 1024

  def apply(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val target = sc.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes < BigInt(target) * bytesPerCore) df.repartition(target) else df
  }
}
