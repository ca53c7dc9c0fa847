package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc micro-benchmark: interpreted closed-form struct aggregate vs the
  * codegen'd Horvitz–Thompson bypass on the same sampled input.
  *
  * Measured 2026-08-12 (sf0.1 lineitem, 600k rows, local[8]):
  * bypass 0.254 s/run, closed-form struct 0.218 s/run — the
  * ObjectHashAggregate interpreted update is NOT a bottleneck (allocation-
  * free stratum memo + partial aggregation mean only moment triples cross
  * the wire), validating SURVEY §8's decision to keep
  * TypedImperativeAggregate over hand-written aggregate codegen. */
object AggPathBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val s = graft.sampling.StratifiedSampler.sample(li, Seq("l_returnflag"), 1.0)
      .persist()
    s.count() // materialize

    def time(label: String)(f: => Unit): Unit = {
      (1 to 2).foreach(_ => f) // warm
      val t0 = System.nanoTime(); (1 to 5).foreach(_ => f)
      println(f"$label: ${(System.nanoTime() - t0) / 5e9}%.3f s/run")
    }
    import graft.functions._
    time("bypass HT (codegen)") {
      s.groupBy(col("l_returnflag"))
        .agg(weighted_sum(col("l_quantity")), weighted_avg(col("l_extendedprice")))
        .collect()
    }
    time("closed-form struct (interpreted)") {
      s.groupBy(col("l_returnflag"))
        .agg(approx_sum(col("l_quantity"), col(weightColumn)),
          approx_avg(col("l_extendedprice"), col(weightColumn)))
        .collect()
    }
    spark.stop()
  }
}
