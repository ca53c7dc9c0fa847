package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft.core.Fanout policy: widen small inputs to all cores, never
 * re-shuffle large ones. */
class FanoutSpec extends AnyFunSuite {
  import TestSpark._

  test("small input is widened to defaultParallelism") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(docs.rdd.getNumPartitions < spark.sparkContext.defaultParallelism,
      "precondition: the test file arrives in few partitions")
    val out = graft.core.Fanout(docs)
    assert(out.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
  }

  test("large input keeps its natural partitioning (no repartition node)") {
    // build an input whose stats exceed cores × 4 MB by unioning a larger
    // scale factor's table with itself (stats sum across union children)
    val one = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val big = one.union(one)
    val out = graft.core.Fanout(big)
    assert(out.queryExecution.optimizedPlan.stats.sizeInBytes >
      BigInt(spark.sparkContext.defaultParallelism) * 4L * 1024 * 1024)
    assert(!out.queryExecution.logical.toString.contains("Repartition"),
      "big inputs must not be re-shuffled just to run a map")
  }
}
