package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pure pin of [[graft.ann.Ann.autoLshParams]] — the auto-sizing that is
 * [[graft.ann.Ann.cosineDedupPairs]]'s DEFAULT. The measured decades
 * (200k/2M vectors, BENCH_sf1 addenda 10/12) anchor the small end; the
 * clamp regions no local corpus can reach (the r13 verdict's "what's
 * wrong #1": the old 24-bit width clamp re-admitted the quadratic
 * candidate term past ~67M vectors, silently) are pinned analytically:
 * width tracks the occupancy-4 target to the raised 30-plane clamp, and
 * band growth solved from the S-curve keeps recall at or above the fixed
 * (16 × 4) form's for EVERY width the clamp admits.
 */
class AnnAutoSizeSpec extends AnyFunSuite {

  /** Independent recall model: P[candidate] for a pair at exactly the
   * threshold angle under (p planes) × (b bands) sign-LSH. */
  private def recall(p: Int, b: Int, threshold: Double): Double = {
    val s = 1.0 - math.acos(threshold) / math.Pi
    1.0 - math.pow(1.0 - math.pow(s, p.toDouble), b.toDouble)
  }

  test("width tracks the occupancy-4 target inside the [8, 30] clamp") {
    for (d <- 3 to 13) {
      val n = math.pow(10, d).toLong
      val (p, _) = graft.ann.Ann.autoLshParams(n, 0.95, 4)
      val p0 = math.ceil(math.log(n / 4.0) / math.log(2.0)).toInt
      assert(p === math.max(8, math.min(30, p0)), s"n=$n")
      if (p0 >= 8 && p0 <= 30) {
        assert(n.toDouble / math.pow(2, p) <= 4.0 + 1e-9,
          s"bucket occupancy must stay <= 4 at n=$n (p=$p)")
      }
    }
    // the clamp region: 10^10 wants p0 = 32 — clamped (and warned) at 30
    assert(graft.ann.Ann.autoLshParams(10000000000L, 0.95, 4)._1 === 30)
  }

  test("measured anchors survive the refactor") {
    // 200k vectors picks the fixed form's own 16 x 4 (10.9 s, addendum 12)
    assert(graft.ann.Ann.autoLshParams(200000L, 0.999, 4) === ((16, 4)))
    // 2M picks width 19 (the 84.9 s post-retune certification point)
    assert(graft.ann.Ann.autoLshParams(2000000L, 0.999, 4)._1 === 19)
    // 20M (the next decade probe) picks width 23 — inside the OLD clamp
    // too, so the probe extends the curve without touching the raise
    assert(graft.ann.Ann.autoLshParams(20000000L, 0.999, 4)._1 === 23)
  }

  test("recall dominance holds through the RAISED clamp (widths 17..30)") {
    // band growth is solved from the S-curve for any width, so the r13
    // dominance pin extends unchanged to the raised cap: wherever the
    // 16-band cap does not bind, auto recall >= the fixed (16, 4) form's
    for (t <- Seq(0.90, 0.95, 0.97, 0.99, 0.999); d <- 4 to 13) {
      val n = math.pow(10, d).toLong
      val (p, b) = graft.ann.Ann.autoLshParams(n, t, 4)
      val r0 = recall(16, 4, t)
      val s = 1.0 - math.acos(t) / math.Pi
      val need =
        if (p <= 16) 4
        else math.ceil(math.log1p(-r0) /
          math.log1p(-math.pow(s, p.toDouble))).toInt
      if (need <= 16) {
        assert(b === math.max(4, math.min(16, need)), s"n=$n t=$t p=$p")
        assert(recall(p, b, t) >= r0 - 1e-12,
          s"auto recall must dominate fixed at n=$n t=$t (p=$p b=$b)")
      } else {
        // the documented honest failure: cap binds, warning logged,
        // explicit knobs are the tool
        assert(b === 16, s"n=$n t=$t")
      }
    }
  }

  test("narrow widths need no band growth (per-band recall only rises)") {
    for (t <- Seq(0.90, 0.99); n <- Seq(100L, 10000L, 200000L)) {
      val (p, b) = graft.ann.Ann.autoLshParams(n, t, 4)
      assert(p <= 16 && b === 4, s"n=$n t=$t")
      assert(recall(p, b, t) >= recall(16, 4, t) - 1e-12)
    }
  }
}
