package graft

import scala.collection.mutable

import org.apache.spark.sql.types.StringType
import org.scalatest.funsuite.AnyFunSuite

/**
 * Stateful fuzz of the TOPK-STATE layer — batch-timed rebasing
 * (`mergePartialsAt` shift logic) × combined time+item aggregation ×
 * driver-guard spills — against an exact model. The round-8 dyadic-carry
 * data-loss bug survived seven rounds of monotone-only tests at the
 * sketch layer; this drives the same invariants through the layer ABOVE,
 * where the batch-time→interval shift, the epoch establishment on first
 * append, spill/re-materialize cycles, and late re-appends to already-aged
 * intervals all compose:
 *
 *  - full-range identity: after ANY op sequence, every key's
 *    whole-history estimate equals the model total exactly (no op may
 *    lose or double mass — the carry/shift/spill bug class);
 *  - windowed queries: the true in-range count never exceeds `upper`,
 *    and `lower ≤ est ≤ upper`;
 *  - spill-free runs additionally pin windowed EXACTNESS in combined mode
 *    (whole-block / clipped-member selection at ample width);
 *  - topKRows(full range) returns the model's exact per-key totals.
 *
 * Key space is tiny (4 keys) and width ample, so CMS answers are exact
 * and the model comparison is equality, not tolerance.
 */
class TopKBatchFuzzSpec extends AnyFunSuite {
  import TestSpark._

  private val Keys = Vector("alpha", "beta", "gamma", "delta")
  private val IvMs = 1000L

  for (spilly <- Seq(false, true); seed <- 1 to 3)
  test(s"batch-timed combined fuzz: spills=$spilly, seed $seed") {
    import spark.implicits._
    val rnd = new scala.util.Random(4100 + seed * 17 + (if (spilly) 1 else 0))
    val opts = graft.topk.TopKOptions(key = "k",
      timeSeriesColumn = None, timeIntervalMs = IvMs,
      epoch = -1L, // established by the FIRST append's batch time
      batchTimed = true,
      size = 4, depth = 5, width = 2048, maxInterval = 4,
      timeUnit = "ms", timeAndItemAggregation = true,
      // each resident CMS interval/block is depth×width ≈ 10k entries —
      // 60k keeps a handful resident and forces spills soon after
      maxDriverEntries = if (spilly) 60000L else 50000000L)
    val st = new graft.topk.TopKState(s"bt_fuzz_${spilly}_$seed", opts, StringType)

    // model: exact counts per (interval, key), intervals by the SAME
    // floorDiv the engine uses; base is the first append's batch time
    val model = mutable.Map.empty[(Long, String), Long].withDefaultValue(0L)
    var base = -1L
    var newestIv = 0L
    var spilled = false
    def ivOf(t: Long): Long = Math.floorDiv(t - base, IvMs)

    def appendAt(batchTime: Long): Unit = {
      if (base < 0L) base = batchTime
      val rows = Keys.flatMap { k =>
        val n = rnd.nextInt(4)
        if (n > 0) { model((ivOf(batchTime), k)) += n }
        Seq.fill(n)(k)
      }
      // empty batches still establish the epoch in the engine? No — an
      // empty df produces no partials, but the epoch is set in
      // mergePartialsAt regardless. Keep batches non-empty to keep the
      // model's base (set above) aligned with the engine's.
      val data = if (rows.isEmpty) Seq(Keys(rnd.nextInt(Keys.size))) else rows
      if (rows.isEmpty) model((ivOf(batchTime), data.head)) += 1
      st.append(data.toDF("k"), batchTime)
      newestIv = math.max(newestIv, ivOf(batchTime))
      if (spilly && st.spillLevelCounts.nonEmpty) spilled = true
    }

    def truth(iv0: Long, iv1: Long, k: String): Long =
      model.iterator.collect { case ((iv, kk), n)
        if kk == k && iv >= iv0 && iv <= iv1 => n }.sum

    def checkFullRange(): Unit = Keys.foreach { k =>
      val total = truth(Long.MinValue, Long.MaxValue, k)
      st.queryFrequency(k, Long.MinValue, Long.MaxValue) match {
        case Some((lo, est, up)) =>
          assert(est === total, s"full-range $k: $est != $total")
          assert(lo <= total && total <= up, s"full-range bounds $k")
        case None => assert(total === 0L, s"$k answered None with mass $total")
      }
    }

    def checkWindow(): Unit = {
      val a = rnd.nextLong(newestIv + 3) - 1
      val b = a + rnd.nextLong(newestIv + 2)
      val (t0, t1) = (base + a * IvMs, base + (b + 1) * IvMs - 1)
      Keys.foreach { k =>
        val tr = truth(a, b, k)
        st.queryFrequency(k, t0, t1) match {
          case Some((lo, est, up)) =>
            assert(tr <= up, s"window [$a,$b] $k: truth $tr above upper $up")
            assert(lo <= est && est <= up, s"window [$a,$b] $k bound order")
            if (!spilled) assert(est === tr,
              s"window [$a,$b] $k: $est != $tr (no spill; ample width)")
          case None =>
            assert(tr === 0L, s"window [$a,$b] $k: None with mass $tr")
        }
      }
    }

    // ~25 ops per run: monotone advances, boundary-exact times, duplicate
    // batch times, LATE re-appends into aged intervals, pre-epoch lates,
    // and forward jumps that force dyadic aging folds
    val T0 = 10000000L
    appendAt(T0) // establishes the epoch
    (1 to 24).foreach { _ =>
      rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 | 4 =>
          // monotone: next interval, jittered inside it
          appendAt(base + (newestIv + 1) * IvMs + rnd.nextLong(IvMs))
        case 5 =>
          // exact interval boundary (floorDiv edge)
          appendAt(base + (newestIv + 1) * IvMs)
        case 6 =>
          // duplicate time: same interval as the newest — mass must add
          appendAt(base + newestIv * IvMs + rnd.nextLong(IvMs))
        case 7 =>
          // LATE: arbitrary past interval, incl. long-aged ones
          appendAt(base + rnd.nextLong(newestIv + 1) * IvMs + rnd.nextLong(IvMs))
        case 8 =>
          // pre-epoch late: negative shift → negative interval
          appendAt(base - (1 + rnd.nextLong(3)) * IvMs + rnd.nextLong(IvMs))
        case 9 =>
          // forward jump: forces aging folds / history formation
          appendAt(base + (newestIv + 2 + rnd.nextLong(6)) * IvMs)
      }
      checkFullRange()
      if (rnd.nextInt(2) == 0) checkWindow()
    }
    if (spilly) assert(spilled, "spilly run never spilled — lower the guard")

    // topKRows over the full range: exact per-key totals, sorted by mass
    val rows = st.topKRows(Long.MinValue, Long.MaxValue, Keys.size)._1
    val expect = Keys.map(k => k -> truth(Long.MinValue, Long.MaxValue, k))
      .filter(_._2 > 0).toMap
    assert(rows.map(_._1).toSet === expect.keySet.map(_.asInstanceOf[Any]))
    rows.foreach { case (k, est, lo, up) =>
      val tr = expect(k.asInstanceOf[String])
      assert(est === tr, s"topKRows $k: $est != $tr")
      assert(lo <= tr && tr <= up)
    }
    assert(rows.map(_._2) === rows.map(_._2).sorted.reverse, "desc order")
  }
}
