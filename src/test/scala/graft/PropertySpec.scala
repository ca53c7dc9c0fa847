package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sketch.{CountMinSketch, StreamSummary, TopKCms}
import org.apache.spark.sql.graft.Weightage

/**
 * Property tests for the engine-independent data structures (SURVEY.md §5:
 * "ScalaCheck property tests for samplers and sketches — reservoir size
 * bounds, CMS overestimate-only guarantee, weight sum ≈ N"). All pure Scala:
 * no SparkSession, so they run in milliseconds.
 */
class PropertySpec extends AnyFunSuite {

  // deterministic generator driver (scalatestplus bridge is not on the
  // classpath; Gen sampling with a fixed seed chain gives the same
  // falsification power reproducibly)
  private def forAll[A](gen: Gen[A], trials: Int = 30)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    (0 until trials).foreach { _ =>
      f(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit = {
    var seed = Seed(7L)
    (0 until 30).foreach { _ =>
      val a = ga.pureApply(Gen.Parameters.default, seed)
      val b = gb.pureApply(Gen.Parameters.default, seed.next)
      f(a, b)
      seed = seed.next.next
    }
  }

  private val keyGen = Gen.chooseNum(0L, 200L)
  private val streamGen = Gen.listOfN(500, keyGen)

  test("CMS never underestimates, and overestimates within eps·N (w.h.p.)") {
    forAll(streamGen) { keys =>
      val cms = new CountMinSketch(5, 64, seed = 42)
      keys.foreach(k => cms.add(k))
      val truth = keys.groupBy(identity).view.mapValues(_.size.toLong)
      truth.foreach { case (k, n) =>
        val est = cms.estimateCount(k)
        assert(est >= n, s"CMS underestimated key $k: $est < $n")
        assert(est <= n + math.ceil(cms.eps * keys.size).toLong + 1,
          s"CMS overestimate beyond eps*N for key $k")
      }
    }
  }

  test("CMS merge ≡ building one sketch from the concatenated stream") {
    forAll(streamGen, streamGen) { (a, b) =>
      val ca = new CountMinSketch(5, 64, seed = 42)
      val cb = new CountMinSketch(5, 64, seed = 42)
      val cAll = new CountMinSketch(5, 64, seed = 42)
      a.foreach(k => ca.add(k)); b.foreach(k => cb.add(k))
      (a ++ b).foreach(k => cAll.add(k))
      ca.merge(cb)
      (a ++ b).distinct.foreach { k =>
        assert(ca.estimateCount(k) === cAll.estimateCount(k))
      }
    }
  }

  test("StreamSummary: guaranteed ≤ truth ≤ estimate; exact at capacity") {
    forAll(streamGen) { keys =>
      val ss = new StreamSummary(capacity = 16)
      keys.foreach(k => ss.add(k))
      val truth = keys.groupBy(identity).view.mapValues(_.size.toLong)
      // topK yields (key, estimate, maxError): est − err ≤ truth ≤ est
      ss.topK(16).foreach { case (k, est, err) =>
        val t = truth(k.asInstanceOf[Long])
        assert(est - err <= t, s"guaranteed count above truth for $k")
        assert(est >= t, s"estimate below truth for $k")
      }
      // exact mode: capacity ≥ distinct keys
      val exact = new StreamSummary(capacity = 1024)
      keys.foreach(k => exact.add(k))
      truth.foreach { case (k, t) =>
        val (est, err) = exact.estimateCount(k)
        assert(est === t && err === 0L, s"exact-mode mismatch for $k")
      }
    }
  }

  test("TopKCms top-k in exact regime equals exact frequency ranking") {
    forAll(streamGen) { keys =>
      val tk = new TopKCms(10, 7, 4096, seed = 42)
      keys.foreach(k => tk.add(k))
      val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      val want = truth.sortBy { case (k, n) => (-n, k) }.take(5)
      val got = tk.topK(5).map { case (k, est, _) => (k.asInstanceOf[Long], est) }
      assert(got.toSeq === want.toSeq)
    }
  }

  test("Weightage pack/decode: exact below mask widths, ratio-preserving above") {
    val nGen = Gen.chooseNum(1L, 1L << 30)
    forAll(nGen, Gen.chooseNum(1L, 1000L)) { (kept0, mult) =>
      val kept = math.max(1L, kept0)
      val total = math.min(kept * mult, Long.MaxValue / 2)
      val raw = Weightage.pack(kept, total, 7)
      if (kept <= Weightage.NumSamplesMask && total <= Weightage.TotalMask) {
        assert(Weightage.numSamples(raw) === kept)
        assert(Weightage.stratumTotal(raw) === total)
      }
      val ratio = Weightage.decode(raw)
      val wantRatio = total.toDouble / kept.toDouble
      assert(math.abs(ratio - wantRatio) / wantRatio < 1e-6,
        s"ratio drifted: $ratio vs $wantRatio")
    }
  }

  test("Weightage pack: huge strata with small kept counts never decode to 1.0") {
    // the ADVICE failure case: total ≫ 2^32 with reservoir-sized kept counts.
    // Truncating shifts would zero numSamples (weight 1.0, off by ~total/kept)
    val r1 = Weightage.decode(Weightage.pack(50L, 1L << 36, 3))
    val want1 = (1L << 36).toDouble / 50.0 // ≈1.37e9, representable
    assert(math.abs(r1 - want1) / want1 < 1e-6, s"$r1 vs $want1")
    // beyond the representable ratio (total/kept > 2^32-1): clamps to the
    // max ratio instead of collapsing to 1.0
    val r2 = Weightage.decode(Weightage.pack(50L, 1L << 38, 3))
    assert(r2 >= Weightage.TotalMask.toDouble * 0.99, s"clamped ratio $r2")
    assert(r2 > 1e9)
    // kept count over the 24-bit mask alone: ratio still preserved
    val r3 = Weightage.decode(Weightage.pack((1L << 26) + 123L, (1L << 28) + 7L, 3))
    val want3 = ((1L << 28) + 7L).toDouble / ((1L << 26) + 123L).toDouble
    assert(math.abs(r3 - want3) / want3 < 1e-6, s"$r3 vs $want3")
  }

  test("CMS fold property: estimates only widen, never below truth") {
    forAll(streamGen) { keys =>
      val cms = new CountMinSketch(4, 128, 17)
      keys.foreach(k => cms.add(k))
      val once = cms.compressed
      val twice = once.compressed
      val truth = keys.groupBy(identity).view.mapValues(_.size.toLong)
      truth.foreach { case (k, n) =>
        val (e0, e1, e2) =
          (cms.estimateCount(k), once.estimateCount(k), twice.estimateCount(k))
        assert(n <= e0 && e0 <= e1 && e1 <= e2,
          s"$k: truth $n, widths 128/64/32 → $e0/$e1/$e2")
      }
    }
  }

  test("sketch serialization round-trips estimates") {
    forAll(streamGen) { keys =>
      val ss = new StreamSummary(capacity = 32)
      keys.foreach(k => ss.add(k))
      val ss2 = StreamSummary.deserialize(ss.serialized)
      assert(ss2.topK(10) === ss.topK(10))

      val tk = new TopKCms(10, 5, 256, seed = 1)
      keys.foreach(k => tk.add(k))
      val tk2 = TopKCms.deserialize(tk.serialized)
      assert(tk2.topK(10) === tk.topK(10))
    }
  }

  test("MinNBuffer: any split/merge order equals brute-force n extreme pairs") {
    import org.apache.spark.sql.graft.MinNBuffer
    // tie-heavy ords (small domain) with full-range extremes mixed in, plus
    // random tiebreaks — the pair ordering is the whole point
    val ordGen = Gen.frequency(
      3 -> Gen.chooseNum(-3L, 3L),
      1 -> Gen.chooseNum(Long.MinValue, Long.MaxValue))
    val pairGen = Gen.zip(ordGen, Gen.chooseNum(Long.MinValue, Long.MaxValue))
    val nGen = Gen.chooseNum(1, 12)
    forAll(Gen.listOfN(80, pairGen), nGen) { (values, n) =>
      for (smallest <- Seq(true, false)) {
        // better = smaller (or larger) ord; ties by SMALLER tb either way
        val ranked = values.sortWith { (a, b) =>
          if (a._1 != b._1) { if (smallest) a._1 < b._1 else a._1 > b._1 }
          else a._2 < b._2
        }
        // output ordering is ascending (ord, tb) regardless of mode
        val truth = ranked.take(n).sorted
        // single buffer
        val one = new MinNBuffer(n, smallest)
        values.foreach { case (o, t) => one.offer(o, t) }
        assert(one.sortedPairs.toSeq === truth)
        // arbitrary 3-way split, merged pairwise in both associations
        val (a, rest) = values.splitAt(values.size / 3)
        val (b, c) = rest.splitAt(rest.size / 2)
        def buf(vs: Seq[(Long, Long)]): MinNBuffer = {
          val m = new MinNBuffer(n, smallest)
          vs.foreach { case (o, t) => m.offer(o, t) }
          m
        }
        val left = buf(a); left.mergeFrom(buf(b)); left.mergeFrom(buf(c))
        val bc = buf(b); bc.mergeFrom(buf(c))
        val right = buf(a); right.mergeFrom(bc)
        assert(left.sortedPairs.toSeq === truth)
        assert(right.sortedPairs.toSeq === truth)
      }
    }
  }
}
