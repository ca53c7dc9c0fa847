package graft

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.scalatest.funsuite.AnyFunSuite

/**
 * Concurrency contract of the spill-active TopK state after the round-8
 * lock restructure (spill writes and query-time spill merges run OUTSIDE
 * `stateLock`):
 *
 *  - a query landing in a spill's write window must fold the parked
 *    (pending) buckets in — the estimate of a key can NEVER drop below
 *    what had already been fully appended when the query started (the
 *    undercount window the `pendingSpill` parking lot closes);
 *  - two threads appending concurrently produce exact final counts — the
 *    single-spiller guard means one of them may skip a spill, but no data
 *    is lost or double-counted.
 *
 * StreamSummary variant with per-interval distinct ≤ capacity, so every
 * estimate is EXACT and the invariants are equalities, not CIs.
 */
class TopKConcurrentSpillSpec extends AnyFunSuite {
  import TestSpark._

  private val dayMs = 86400000L

  private def mkState(name: String, maxEntries: Long): graft.topk.TopKState = {
    val opts = graft.topk.TopKOptions(key = "k",
      timeSeriesColumn = Some("ts"), timeIntervalMs = dayMs,
      size = 5, streamSummary = true, capacity = 512,
      maxInterval = 80, timeUnit = "ms", maxDriverEntries = maxEntries)
    new graft.topk.TopKState(name, opts, org.apache.spark.sql.types.StringType)
  }

  private def cleanup(st: graft.topk.TopKState): Unit =
    st.spillDirOption.foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
    }

  test("queries concurrent with spilling appends never undercount") {
    import spark.implicits._
    val st = mkState("conc_spill_rw", maxEntries = 600)
    val days = 18
    val perDayHeavy = 7L
    // completed appends, as the reader's lower-bound oracle
    val published = new AtomicLong(0)
    val failure = new AtomicReference[Throwable](null)

    val writer = new Thread(() => {
      try {
        (0 until days).foreach { d =>
          val tail = (0 until 500).map(j => (d.toLong * dayMs, s"t${d * 500 + j}"))
          val heavy = Seq.fill(perDayHeavy.toInt)((d.toLong * dayMs, "hh"))
          st.append((tail ++ heavy).toDF("ts", "k"))
          published.incrementAndGet()
        }
      } catch { case t: Throwable => failure.compareAndSet(null, t) }
    }, "conc-writer")

    val readers = (1 to 2).map { i =>
      new Thread(() => {
        try {
          while (published.get() < days && failure.get() == null) {
            val before = published.get()
            st.queryFrequency("hh", Long.MinValue, Long.MaxValue).foreach {
              case (lower, est, _) =>
                // every fully-appended batch must be visible, whether its
                // buckets are resident, parked mid-spill, or spilled
                assert(est >= before * perDayHeavy,
                  s"undercount: est $est < ${before * perDayHeavy} " +
                    s"(${before} appends were complete before the query)")
                assert(lower <= est, "bounds stay ordered mid-merge")
            }
          }
        } catch { case t: Throwable => failure.compareAndSet(null, t) }
      }, s"conc-reader-$i")
    }

    writer.start(); readers.foreach(_.start())
    writer.join(180000); readers.foreach(_.join(30000))
    if (failure.get() != null) throw failure.get()
    assert(published.get() === days.toLong, "writer finished")
    // final answer exact, spill actually exercised
    assert(st.queryFrequency("hh", Long.MinValue, Long.MaxValue) ===
      Some((days * perDayHeavy, days * perDayHeavy, days * perDayHeavy)))
    assert(st.spilledBucketCount > 0, "test must actually drive the spill path")
    cleanup(st)
  }

  test("two concurrent appenders: exact totals, single-spiller guard loses nothing") {
    import spark.implicits._
    val st = mkState("conc_spill_ww", maxEntries = 600)
    val daysPerWriter = 10
    val failure = new AtomicReference[Throwable](null)
    def writer(offset: Int, name: String): Thread = new Thread(() => {
      try {
        (0 until daysPerWriter).foreach { i =>
          val d = offset + i
          val tail = (0 until 400).map(j => (d.toLong * dayMs, s"w$offset-${d * 400 + j}"))
          val heavy = Seq.fill(5)((d.toLong * dayMs, "hh"))
          st.append((tail ++ heavy).toDF("ts", "k"))
        }
      } catch { case t: Throwable => failure.compareAndSet(null, t) }
    }, name)
    val w1 = writer(0, "conc-w1")
    val w2 = writer(100, "conc-w2") // disjoint day ranges → disjoint intervals
    w1.start(); w2.start()
    w1.join(180000); w2.join(180000)
    if (failure.get() != null) throw failure.get()
    val total = 2L * daysPerWriter * 5
    assert(st.queryFrequency("hh", Long.MinValue, Long.MaxValue) ===
      Some((total, total, total)),
      "concurrent appends must neither lose nor double-count")
    // one tail key from each writer's range survives exactly
    assert(st.queryFrequency("w0-403", 1L * dayMs, 2L * dayMs - 1) ===
      Some((1L, 1L, 1L)))
    assert(st.queryFrequency("w100-40203", 100L * dayMs, 101L * dayMs - 1) ===
      Some((1L, 1L, 1L)))
    cleanup(st)
  }

  test("combined mode: readers through block spills (member drops) never undercount") {
    // the timeAndItem spill path is the trickiest: a picked block takes
    // its member intervals with it (dropped, not spilled), queries mid-
    // window fold the parked block, and the refined fast path must bail
    // to the merged path the moment spill overlaps the range. CMS with
    // few distinct keys at width 256 ⇒ every estimate exact, so the
    // invariants are equalities.
    import spark.implicits._
    val opts = graft.topk.TopKOptions(key = "k",
      timeSeriesColumn = Some("ts"), timeIntervalMs = dayMs,
      size = 5, depth = 2, width = 256, maxInterval = 4,
      timeAndItemAggregation = true, timeUnit = "ms", maxDriverEntries = 1200)
    val st = new graft.topk.TopKState("conc_spill_tai", opts,
      org.apache.spark.sql.types.StringType)
    val days = 18
    val perDayHeavy = 7L
    val published = new AtomicLong(0)
    val failure = new AtomicReference[Throwable](null)
    val writer = new Thread(() => {
      try {
        (0 until days).foreach { d =>
          val tail = (0 until 3).map(j => (d.toLong * dayMs, s"d$d-$j"))
          val heavy = Seq.fill(perDayHeavy.toInt)((d.toLong * dayMs, "hh"))
          st.append((tail ++ heavy).toDF("ts", "k"))
          published.incrementAndGet()
        }
      } catch { case t: Throwable => failure.compareAndSet(null, t) }
    }, "tai-writer")
    val readers = (1 to 2).map { i =>
      new Thread(() => {
        try {
          while (published.get() < days && failure.get() == null) {
            val before = published.get()
            // point estimates and the (possibly refined) top-k listing
            st.queryFrequency("hh", Long.MinValue, Long.MaxValue).foreach {
              case (lower, est, upper) =>
                assert(est >= before * perDayHeavy,
                  s"undercount: est $est < ${before * perDayHeavy}")
                assert(lower <= est && est <= upper, "bounds ordered")
            }
            val rows = st.topKRows(Long.MinValue, Long.MaxValue, 5)._1
            rows.find(_._1 == "hh").foreach { case (_, est, _, _) =>
              assert(est >= before * perDayHeavy,
                s"top-k undercount: $est < ${before * perDayHeavy}")
            }
          }
        } catch { case t: Throwable => failure.compareAndSet(null, t) }
      }, s"tai-reader-$i")
    }
    writer.start(); readers.foreach(_.start())
    writer.join(180000); readers.foreach(_.join(30000))
    if (failure.get() != null) throw failure.get()
    assert(published.get() === days.toLong)
    assert(st.queryFrequency("hh", Long.MinValue, Long.MaxValue).get._2 ===
      days * perDayHeavy, "final estimate exact through block spills")
    // every per-day key survives with its exact count
    (0 until days).foreach { d =>
      assert(st.queryFrequency(s"d$d-0",
        d.toLong * dayMs, (d + 1).toLong * dayMs - 1).get._2 === 1L,
        s"day-$d key lost through member drops")
    }
    assert(st.spilledBucketCount > 0, "test must actually drive the spill path")
    cleanup(st)
  }
}
