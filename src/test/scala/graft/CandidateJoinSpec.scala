package graft

import org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint
import org.scalatest.funsuite.AnyFunSuite

import graft.core.CandidateJoin

/** Pins the candidate-join strategy policy's SIZE WINDOW: no hint below
 * the broadcast threshold (AQE broadcasts), `shuffle_hash` inside the
 * window, and NO hint above `shuffleHashMaxBytes` — the r14 third-decade
 * lesson: a shuffled-hash build side cannot spill, and the pinned shape
 * OOM'd at 5M docs ("not enough memory to build hash map") while
 * sort-merge spills and finishes. */
class CandidateJoinSpec extends AnyFunSuite {
  import TestSpark.spark

  private def hinted(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.logical.collect { case h: UnresolvedHint => h.name }
      .contains("shuffle_hash")

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  import spark.implicits._
  private def frame() = (1 to 1000).map(i => (i.toLong, s"content-$i"))
    .toDF("id", "text")

  test("below the broadcast threshold: no hint (AQE broadcasts)") {
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> (10L << 20).toString) {
      val df = frame()
      assert(!hinted(CandidateJoin.maybeShuffleHash(df)(df)))
    }
  }

  test("inside the window: shuffle_hash pinned") {
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "1024") {
      val df = frame() // estimate is tens of KB: above 1 KB, below 64 MB
      assert(hinted(CandidateJoin.maybeShuffleHash(df)(df)))
    }
  }

  test("above shuffleHashMaxBytes: no hint (sort-merge spills; " +
    "a shuffled-hash build side cannot)") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "1024",
      "spark.graft.candidateJoin.shuffleHashMaxBytes" -> "2048") {
      val df = frame()
      assert(!hinted(CandidateJoin.maybeShuffleHash(df)(df)))
    }
  }

  test("geometry-derived cap: 2/5 of the per-task execution share") {
    // this box's bench geometry resolves to the r14 measured constant
    assert(CandidateJoin.derivedShuffleHashMaxBytes(
      8L << 30, 0.6, 32) === 64424509L) // ~61 MiB ≈ the r14 64 MB window
    // a 4 GB x 8-core executor has 2x this box's per-task share…
    assert(CandidateJoin.derivedShuffleHashMaxBytes(
      4L << 30, 0.6, 8) === 128849018L)
    // …and a 16 GB x 4-core one is ~16x this box's per-task share (exact
    // up to the per-call double rounding)
    assert(CandidateJoin.derivedShuffleHashMaxBytes(
      16L << 30, 0.6, 4) === 1030792151L)
    // degenerate cores never divide by zero
    assert(CandidateJoin.derivedShuffleHashMaxBytes(1L << 30, 0.6, 0) > 0)
  }

  test("cluster cap refuses to derive when spark.executor.cores is unset") {
    // standalone/Mesos coarse-grained: cores legitimately unset while
    // executors run worker-core-many concurrent tasks — defaulting cores
    // to 1 inflated the cap ~cores×, pinning shuffle-hash at sizes where
    // the unspillable build maps OOM. Unset must fall back, not derive.
    assert(CandidateJoin.clusterShuffleHashMaxBytes(
      64L << 30, 0.6, None) === CandidateJoin.FallbackShuffleHashMaxBytes)
    // with cores set the derivation applies unchanged
    assert(CandidateJoin.clusterShuffleHashMaxBytes(8L << 30, 0.6, Some(32))
      === CandidateJoin.derivedShuffleHashMaxBytes(8L << 30, 0.6, 32))
  }

  test("no-stats sentinel: never treated as a real measurement") {
    // an RDD-backed plan has no file-scan stats — its estimate is
    // spark.sql.defaultSizeInBytes (Long.MaxValue), which must read as
    // "unknown" (sort-merge, spill-safe), not as "huge input"
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "1024") {
      val rows = (1 to 100).map(i =>
        org.apache.spark.sql.Row(i.toLong, s"content-$i"))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType)))
      val rddDf = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
      assert(rddDf.queryExecution.optimizedPlan.stats.sizeInBytes >=
        BigInt(spark.sessionState.conf.defaultSizeInBytes))
      assert(!hinted(CandidateJoin.maybeShuffleHash(rddDf)(rddDf)))
    }
  }

  test("explicit on/off overrides ignore the window") {
    withConfs(
      "spark.graft.candidateJoin.shuffleHash" -> "on",
      "spark.graft.candidateJoin.shuffleHashMaxBytes" -> "1") {
      val df = frame()
      assert(hinted(CandidateJoin.maybeShuffleHash(df)(df)))
    }
    withConfs("spark.graft.candidateJoin.shuffleHash" -> "off",
      "spark.sql.autoBroadcastJoinThreshold" -> "1024") {
      val df = frame()
      assert(!hinted(CandidateJoin.maybeShuffleHash(df)(df)))
    }
  }
}
