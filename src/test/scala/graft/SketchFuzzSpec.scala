package graft

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.sketch._

/**
 * Stateful fuzz of [[TimeBucketedSketch]] in all three aging modes against
 * an exact model, through op sequences no hand-written scenario explores:
 * monotone and LATE appends, interval park/restore cycles (the failed-spill
 * path), history-block park/restore cycles, and snapshot round-trips at
 * arbitrary points. Invariants checked after every op:
 *
 *  - overestimate-only: a range estimate never drops below the exact count
 *    of the REQUESTED range, in any mode (coarse history inclusion and CMS
 *    collisions only ever add);
 *  - full-range exactness at ample width: the whole-history estimate
 *    equals the model total (no op sequence may lose or double mass);
 *  - combined mode: arbitrary partial ranges are ALSO exact (whole-block /
 *    member-clipping selection), and refinedEstimate agrees with the
 *    merged answer and keeps truth ≤ upper.
 */
class SketchFuzzSpec extends AnyFunSuite {

  private val Keys = (1 to 8).map(i => s"k$i")

  private def mk(): IntervalSketch =
    CmsInterval(new TopKCms(10, 5, 2048, 7)): IntervalSketch

  private def newSketch(mode: String): TimeBucketedSketch = mode match {
    case "time" => new TimeBucketedSketch(4, () => mk(), minWidth = 256)
    case "item" =>
      new TimeBucketedSketch(4, () => mk(), itemAggregation = true, minWidth = 256)
    case "combined" =>
      new TimeBucketedSketch(4, () => mk(), minWidth = 256, timeAndItem = true)
    // Space-Saving family through the same carry/restore machinery —
    // ample capacity ⇒ exact, so the full-range identity still pins
    // data preservation (the carry-overwrite loss applied to it equally)
    case "time-summary" =>
      new TimeBucketedSketch(4,
        () => SummaryInterval(new StreamSummary(512)): IntervalSketch)
  }

  private def truthIn(model: mutable.Map[(Long, String), Long],
      a: Long, b: Long, key: String): Long =
    model.iterator.collect { case ((iv, k), n) if k == key && iv >= a && iv <= b => n }.sum

  for (mode <- Seq("time", "item", "combined", "time-summary"); seed <- 1 to 4)
  test(s"stateful fuzz: $mode mode, seed $seed") {
    val rnd = new scala.util.Random(seed * 37 + mode.hashCode)
    var tb = newSketch(mode)
    val model = mutable.Map.empty[(Long, String), Long]
    var newest = 0L

    def appendOp(): Unit = {
      // mostly advance the stream; sometimes write LATE into the past
      val iv =
        if (newest > 2 && rnd.nextInt(4) == 0) rnd.nextLong(newest)
        else { newest += (if (rnd.nextInt(3) == 0) 2 else 1); newest }
      val counts = (1 to 1 + rnd.nextInt(3)).map { _ =>
        val k = Keys(rnd.nextInt(Keys.size))
        val n = 1L + rnd.nextInt(9)
        model((iv, k)) = model.getOrElse((iv, k), 0L) + n
        k -> n
      }
      val sk: IntervalSketch =
        if (mode == "time-summary") {
          val s = new StreamSummary(512)
          counts.foreach { case (k, n) => s.add(k, n) }
          SummaryInterval(s)
        } else {
          val s = new TopKCms(10, 5, 2048, 7)
          counts.foreach { case (k, n) => s.add(k, n) }
          CmsInterval(s)
        }
      tb.addTo(iv, sk)
    }

    def parkRestoreInterval(): Unit = {
      val ivs = tb.intervals.keys.toSeq
      if (ivs.nonEmpty) {
        val iv = ivs(rnd.nextInt(ivs.size))
        val fold = tb.foldOf(iv)
        tb.removeInterval(iv).foreach { parked =>
          if (rnd.nextBoolean()) appendOp() // concurrent work in the window
          tb.restoreInterval(iv, parked, fold)
        }
      }
    }

    def parkRestoreBlock(): Unit = {
      val spans = tb.history.keys.toSeq
      if (spans.nonEmpty) {
        val span = spans(rnd.nextInt(spans.size))
        tb.removeHistory(span).foreach { parked =>
          if (rnd.nextBoolean()) appendOp()
          tb.restoreHistoryBlock(span, parked)
        }
      }
    }

    def snapshotRoundTrip(): Unit =
      tb = TimeBucketedSketch.fromSnapshot(tb.snapshotBytes)

    (1 to 160).foreach { _ =>
      rnd.nextInt(10) match {
        case 7 => parkRestoreInterval()
        case 8 => if (mode != "time") parkRestoreBlock()
        case 9 => snapshotRoundTrip()
        case _ => appendOp()
      }

      // invariants on random ranges
      (1 to 3).foreach { _ =>
        val a = rnd.nextLong(newest + 1)
        val b = a + rnd.nextLong(newest - a + 1)
        val key = Keys(rnd.nextInt(Keys.size))
        val exact = truthIn(model, a, b, key)
        tb.mergedRange(a, b) match {
          case Some(m) =>
            val est = m.estimate(key)._2
            assert(est >= exact,
              s"$mode/$seed: range [$a,$b] $key est $est < exact $exact")
            if (mode == "combined") {
              assert(est === exact,
                s"combined/$seed: partial range [$a,$b] $key est $est != $exact")
              val (_, refined, upper) = tb.refinedEstimate(a, b, key).get
              assert(refined === est, "refined must agree with merged here")
              assert(exact <= upper, "truth above the refined upper bound")
            }
          case None =>
            assert(exact === 0L,
              s"$mode/$seed: range [$a,$b] covered nothing but exact=$exact")
        }
      }
      // full-range exactness: no op may lose or double mass
      Keys.foreach { key =>
        val total = truthIn(model, 0L, newest, key)
        val est = tb.mergedRange(0L, newest).map(_.estimate(key)._2).getOrElse(0L)
        assert(est === total,
          s"$mode/$seed: full-range $key est $est != total $total")
      }
    }
  }
}
