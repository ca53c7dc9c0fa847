package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Spill store at scale: ~300 spilled buckets over a 10⁵-key space, driven
 * 100× past `maxDriverEntries` — the long-lived-table shape the driver
 * guard + parquet interval store exist for. Pins that
 *
 *  - the driver's live counter commitment NEVER exceeds the guard, however
 *    much history accumulates (the silent driver-OOM shape);
 *  - batch compaction keeps the spill store's file count bounded (one tiny
 *    parquet dir per spill event otherwise — unbounded file growth);
 *  - heavy hitters stay EXACT through spill + the executor-side merge of
 *    hundreds of buckets (present in every interval with error 0, their
 *    counters survive every capacity-bounded merge — the Space-Saving
 *    guarantee the structure exists for), and any single interval's tail
 *    keys stay exact through the spill round-trip (per-interval distinct ≤
 *    capacity, so nothing evicts);
 *  - the whole run — 30 appends, ~300 spilled buckets, full-range queries —
 *    stays inside a bounded wall-clock budget.
 */
class TopKSpillScaleSpec extends AnyFunSuite {
  import TestSpark._

  private val tailPerIv = 5000
  private val totalTailKeys = 100000
  private val intervals = 300
  private val heavies = 10
  private val guard = 15000L // total entries reach ~1.5e6 = 100x the guard
  private val dayMs = 86400000L

  /** Day-intervals [d0, d1): every interval carries heavy keys h0..h9 with
   * 10+j occurrences each, plus a rotating window of 10⁴ once-only tail
   * keys from a 10⁵-key space (interval d holds t((d·10⁴+j) mod 10⁵)). */
  private def batch(d0: Int, d1: Int): DataFrame = {
    val d = expr(s"id div $tailPerIv") + lit(d0)
    val tail = spark.range((d1 - d0).toLong * tailPerIv).select(
      (d * lit(dayMs)).cast("long").as("ts"),
      concat(lit("t"),
        pmod(d * lit(tailPerIv) + pmod(col("id"), lit(tailPerIv)),
          lit(totalTailKeys))).as("k"))
    import spark.implicits._
    val heavy = (for {
      day <- d0 until d1
      j <- 0 until heavies
      _ <- 0 until (10 + j)
    } yield (day.toLong * dayMs, s"h$j")).toDF("ts", "k")
    tail.unionByName(heavy)
  }

  test("levelled compaction: deep promotion keeps every level bounded, answers exact") {
    // 40 spill events at threshold 3 drive promotions through L1 into L2 —
    // pinning that write volume is O(N log N) level promotion, never the
    // whole-store rewrite (which would re-copy old data on every 4th spill)
    val days = 40
    val opts = graft.topk.TopKOptions(key = "k",
      timeSeriesColumn = Some("ts"), timeIntervalMs = dayMs,
      size = 5, streamSummary = true, capacity = 512,
      maxInterval = days + 10, timeUnit = "ms",
      maxDriverEntries = 600) // each day ~501 distinct keys → every append spills
    val st = new graft.topk.TopKState("spill_levels", opts,
      org.apache.spark.sql.types.StringType)
    st.compactThreshold = 3
    import spark.implicits._
    (0 until days).foreach { d =>
      val tail = (0 until 500).map(j => (d.toLong * dayMs, s"t${d * 500 + j}"))
      val heavy = Seq.fill(7)((d.toLong * dayMs, "hh"))
      st.append((tail ++ heavy).toDF("ts", "k"))
    }
    val levels = st.spillLevelCounts
    assert(levels.keys.max >= 2, s"expected promotion into L2+, got $levels")
    assert(levels.values.forall(_ <= 3 + 1),
      s"every level must stay bounded by the threshold, got $levels")
    assert(st.queryFrequency("hh", Long.MinValue, Long.MaxValue) ===
      Some((days * 7L, days * 7L, days * 7L)),
      "heavy key must stay exact through multi-level compaction")
    val r = st.queryFrequency("t5003", 10L * dayMs, 11L * dayMs - 1)
    assert(r === Some((1L, 1L, 1L)),
      s"tail key t5003 appears once in (promoted) interval 10, got $r")
    st.spillDirOption.foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
    }
  }

  test("dyadic HISTORY blocks spill without double-counting (incl. length-1 blocks)") {
    // maxInterval 4 over 12 day-intervals folds the older 8 into dyadic
    // history blocks — lengths 1, 2, 4 all occur as the binary counter
    // rolls. A tiny guard then forces those HISTORY blocks (not intervals)
    // through the spill path. Regression for the parked-bucket dispatch
    // bug: removing a length-1 history block via removeInterval left it
    // resident AND spilled — every estimate over its span then doubled.
    val opts = graft.topk.TopKOptions(key = "k",
      timeSeriesColumn = Some("ts"), timeIntervalMs = dayMs,
      size = 5, streamSummary = true, capacity = 64,
      maxInterval = 4, timeUnit = "ms",
      maxDriverEntries = 100)
    val st = new graft.topk.TopKState("spill_history", opts,
      org.apache.spark.sql.types.StringType)
    import spark.implicits._
    val days = 12
    (0 until days).foreach { d =>
      val tail = (0 until 10).map(j => (d.toLong * dayMs, s"ht${d * 10 + j}"))
      val heavy = Seq.fill(3)((d.toLong * dayMs, "hh"))
      st.append((tail ++ heavy).toDF("ts", "k"))
    }
    assert(st.spilledBucketCount > 0, "history blocks must actually spill")
    val full = st.queryFrequency("hh", Long.MinValue, Long.MaxValue)
    assert(full === Some((days * 3L, days * 3L, days * 3L)),
      s"heavy key must be exact (a resident+spilled duplicate doubles it): $full")
    // a tail key in the oldest (spilled-history) region stays exactly 1
    // when queried over its own day: the overlapping history block's union
    // (4 days x 11 keys) fits the capacity, so the merge is exact. (The
    // FULL range merges ~121 distinct keys into capacity 64 — Space-Saving
    // eviction territory, deliberately not asserted for tail keys.)
    val r = st.queryFrequency("ht5", 0L, dayMs - 1)
    assert(r === Some((1L, 1L, 1L)), s"tail key in spilled history, got $r")
    // repeat: merged results are stable (no fold into live state)
    assert(st.queryFrequency("hh", Long.MinValue, Long.MaxValue) === full)
    st.spillDirOption.foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
    }

    // LENGTH-1 history block specifically: 13 distinct keys per day, guard
    // 60 — entries cross the guard exactly at day 4 (65), the SAME append
    // whose compaction folds day 0 into history ((0,1)). The spill picker
    // therefore takes a LENGTH-1 HISTORY block (history precedes
    // intervals). Mis-dispatching its removal (removeInterval on a history
    // span is a no-op) leaves it resident AND spilled — day-0 doubles.
    val opts1 = opts.copy(capacity = 16, maxDriverEntries = 60)
    val st1 = new graft.topk.TopKState("spill_history_len1", opts1,
      org.apache.spark.sql.types.StringType)
    (0 until 5).foreach { d =>
      val tail = (0 until 12).map(j => (d.toLong * dayMs, s"g${d * 12 + j}"))
      val heavy = Seq.fill(3)((d.toLong * dayMs, "hh"))
      st1.append((tail ++ heavy).toDF("ts", "k"))
    }
    assert(st1.spilledBucketCount > 0, "the length-1 history block must spill")
    assert(st1.queryFrequency("hh", Long.MinValue, Long.MaxValue) ===
      Some((15L, 15L, 15L)),
      "a resident+spilled duplicate of the length-1 block doubles day 0")
    assert(st1.queryFrequency("g2", 0L, dayMs - 1) === Some((1L, 1L, 1L)))
    st1.spillDirOption.foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
    }
  }

  test("300 buckets x 10^5-key space spill past the guard: bounded driver, bounded files, exact answers") {
    val t0 = System.nanoTime()
    val opts = graft.topk.TopKOptions(key = "k",
      timeSeriesColumn = Some("ts"), timeIntervalMs = dayMs,
      size = 5, streamSummary = true, capacity = 2 * tailPerIv,
      maxInterval = intervals + 100, timeUnit = "ms",
      maxDriverEntries = guard)
    val st = new graft.topk.TopKState("spill_scale", opts,
      org.apache.spark.sql.types.StringType)
    (0 until intervals by 20).foreach { d0 =>
      st.append(batch(d0, d0 + 20))
      assert(st.buckets.entryCount <= guard,
        s"driver commitment ${st.buckets.entryCount} exceeds the guard " +
          s"after intervals [0, ${d0 + 20})")
    }
    // ~297 of 300 buckets spilled (the guard keeps ~3 resident), but the
    // store holds O(compactThreshold) batch dirs, not one per spill event
    assert(st.spilledBucketCount >= intervals - 5,
      s"expected nearly all buckets spilled, got ${st.spilledBucketCount}")
    assert(st.spillBatchCount <= 17,
      s"compaction must bound the store at ~compactThreshold batch dirs, " +
        s"got ${st.spillBatchCount}")

    // heavy hitters: exact counts and exact top-k through the executor-side
    // merge of ~297 spilled + ~3 resident buckets (each queryFrequency is
    // its own full merge job — sample three, the top-k pass covers five)
    Seq(0, 4, 9).foreach { j =>
      val expected = intervals.toLong * (10 + j)
      assert(st.queryFrequency(s"h$j", Long.MinValue, Long.MaxValue) ===
        Some((expected, expected, expected)),
        s"heavy key h$j must stay exact through the spill-store merge")
    }
    val (top, _, _) = st.topKRows(Long.MinValue, Long.MaxValue, 5)
    assert(top.map(_._1) === (heavies - 1 to heavies - 5 by -1).map(i => s"h$i"),
      s"full-range top-5 must be the five heaviest keys, got $top")
    top.zipWithIndex.foreach { case ((k, est, lower, _), i) =>
      val expected = intervals.toLong * (10 + heavies - 1 - i)
      assert(est === expected && lower === expected,
        s"top-k count for $k must be exact (est=$est lower=$lower)")
    }

    // any single long-spilled interval answers its tail keys exactly
    // (per-interval distinct ≤ capacity — the spill round-trip loses nothing)
    val r = st.queryFrequency("t25007", 5L * dayMs, 6L * dayMs - 1)
    assert(r === Some((1L, 1L, 1L)),
      s"tail key t25007 appears once in (spilled) interval 5, got $r")
    val r2 = st.queryFrequency("t123", 0L, dayMs - 1)
    assert(r2 === Some((1L, 1L, 1L)),
      s"tail key t123 appears once in (spilled) interval 0, got $r2")

    val elapsedSec = (System.nanoTime() - t0) / 1e9
    assert(elapsedSec <= 120.0,
      f"spill-scale run took $elapsedSec%.1f s (budget 120 s)")

    // hygiene: retire the warehouse-dir spill store this test created
    st.spillDirOption.foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
    }
  }
}
