package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's contention adjudication (BENCH_r10 entered the round record
 * at 3x its steady state because the box was shared during the run and the
 * summary line carried no signal). The detection math is pure and pinned
 * directly; the end-to-end property — a CPU-hog SIBLING PROCESS inflates a
 * fixed workload past the suspect threshold against an uncontended
 * reference — runs against real `sh` spin loops. */
class BenchAdjudicateSpec extends AnyFunSuite {

  test("suspects: >factor AND >floor above the reference, only with a reference") {
    val ref = Map("q1" -> 1.0, "q2" -> 0.05, "q3" -> 5.0)
    val medians = Seq(
      "q1" -> 3.5, // 3.5x ref, 2.5s above -> suspect
      "q2" -> 0.2, // 4x ref but only 0.15s above the floor -> jitter, not suspect
      "q3" -> 9.0, // 1.8x ref -> below factor, not suspect
      "q4" -> 60.0) // no reference entry -> cannot adjudicate
    assert(BenchAdjudicate.suspects(medians, ref) === Seq("q1"))
    // the floor is a parameter: drop it and the tiny query trips too
    assert(BenchAdjudicate.suspects(medians, ref, floor = 0.1) ===
      Seq("q1", "q2"))
    // empty reference (first run in a repo) -> nothing is ever suspect
    assert(BenchAdjudicate.suspects(medians, Map.empty) === Seq.empty)
  }

  test("readRef parses a bench summary line's queries and head") {
    val f = java.nio.file.Files.createTempFile("bench_ref", ".json")
    java.nio.file.Files.write(f,
      ("""{"metric":"total","value":35.9,"unit":"sec,","queries":""" +
        """{"q1":1.25,"q2":0.5},"sf":"/x","head":"""" + ("ab12" * 10) +
        """"}""").getBytes("UTF-8"))
    val (qs, head, sf) = BenchAdjudicate.readRef(f.toString)
    assert(qs === Map("q1" -> 1.25, "q2" -> 0.5))
    assert(head === Some("ab12" * 10))
    assert(sf === Some("/x"))
    // absent file / malformed JSON degrade to no-reference, never throw
    assert(BenchAdjudicate.readRef("/nonexistent/x.json") ===
      ((Map.empty, None, None)))
    java.nio.file.Files.write(f, "not json".getBytes("UTF-8"))
    assert(BenchAdjudicate.readRef(f.toString) === ((Map.empty, None, None)))
    java.nio.file.Files.delete(f)
  }

  test("promote: only a clean, full, same-sf run may replace the reference") {
    val sf = "/root/testdata/sf0.1"
    // the r11 incident, replayed: the driver's run completed with start
    // loadavg 3.2 — it must NOT replace the idle-box record even though it
    // adjudicated its own suspect correctly
    assert(!BenchAdjudicate.promote(3.2, Seq.empty, sf, Some(sf), subset = false))
    // a run that tripped the contention detector is not clean, however low
    // the loadavg reads (suspects are the direct per-query evidence)
    assert(!BenchAdjudicate.promote(0.1, Seq("q36"), sf, Some(sf), subset = false))
    // a subset run (SPARK_GRAFT_BENCH_ONLY) would shrink the ref's query map
    assert(!BenchAdjudicate.promote(0.1, Seq.empty, sf, Some(sf), subset = true))
    // an sf1 run must not clobber the sf0.1 reference the driver uses
    assert(!BenchAdjudicate.promote(0.1, Seq.empty, "/tmp/sf1", Some(sf),
      subset = false))
    // the clean idle-box run promotes; so does the first run in a repo
    // (no ref sf on record) and a box with no readable loadavg
    assert(BenchAdjudicate.promote(0.77, Seq.empty, sf, Some(sf), subset = false))
    assert(BenchAdjudicate.promote(0.77, Seq.empty, sf, None, subset = false))
    assert(BenchAdjudicate.promote(-1.0, Seq.empty, sf, Some(sf), subset = false))
    // threshold is a parameter
    assert(BenchAdjudicate.promote(3.2, Seq.empty, sf, Some(sf), subset = false,
      maxLoad = 4.0))
    // a run with ANY failed query execution never promotes: a crash "runs"
    // in milliseconds, suspects only flag medians SLOWER than the ref, and
    // a promoted near-zero reference would make every healthy run suspect
    // (which blocks promotion) — a permanent ratchet
    assert(!BenchAdjudicate.promote(0.1, Seq.empty, sf, Some(sf),
      subset = false, failures = 1))
    assert(BenchAdjudicate.promote(0.1, Seq.empty, sf, Some(sf),
      subset = false, failures = 0))
  }

  test("vsRefTotal: ratio over the shared query set only") {
    val ref = Map("q1" -> 1.0, "q2" -> 2.0, "q9" -> 100.0)
    // q9 missing from the run and q3 missing from the ref — neither biases
    val got = BenchAdjudicate.vsRefTotal(
      Seq("q1" -> 1.5, "q2" -> 3.0, "q3" -> 50.0), ref)
    assert(got.exists(v => math.abs(v - 1.5) < 1e-9), s"got $got")
    assert(BenchAdjudicate.vsRefTotal(Seq("qX" -> 1.0), ref).isEmpty)
    assert(BenchAdjudicate.vsRefTotal(Seq.empty, ref).isEmpty)
    assert(BenchAdjudicate.vsRefTotal(Seq("q1" -> 1.0), Map("q1" -> 0.0)).isEmpty)
  }

  test("gitHead resolves in this repo; loadAvg reads on this platform") {
    val h = BenchAdjudicate.gitHead(".")
    assert(h.exists(_.matches("[0-9a-f]{40}")), s"head: $h")
    assert(BenchAdjudicate.loadAvg() >= 0.0, "loadavg should read on linux")
  }

  test("a CPU-hog sibling process trips the suspect flag") {
    // fixed work (not fixed time): wall clock then reflects the CPU share
    // the scheduler gives this thread, exactly what box contention steals
    def spin(): Double = {
      var x = 0x9E3779B97F4A7C15L
      var i = 0L
      val iters = 400000000L
      val t0 = System.nanoTime()
      while (i < iters) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        i += 1
      }
      if (x == 42L) println("") // keep the loop alive past the JIT
      (System.nanoTime() - t0) / 1e9
    }
    def median5(): Double = {
      val t = (1 to 5).map(_ => spin()).sorted
      t(2)
    }
    spin() // JIT warm
    val cores = Runtime.getRuntime.availableProcessors()
    def attempt(): (Double, Double) = {
      val refT = median5()
      assert(refT > 0.01, s"workload too small to measure: $refT")
      // 6 spin processes per core: the worker's fair share drops to ~1/7,
      // comfortably past the 3x suspect factor even under scheduler noise
      val hogs = (1 to cores * 6).map { _ =>
        new ProcessBuilder("sh", "-c", "while : ; do : ; done").start()
      }
      val hotT =
        try {
          Thread.sleep(300) // let the scheduler absorb the hogs
          median5()
        } finally hogs.foreach(_.destroyForcibly())
      (refT, hotT)
    }
    var (refT, hotT) = attempt()
    if (hotT <= 3 * refT) {
      // contention A/Bs are racy when sibling suites share the box —
      // one retry before judging
      val again = attempt(); refT = again._1; hotT = again._2
    }
    if (hotT <= 3 * refT && BenchAdjudicate.loadAvg() > cores / 4.0) {
      // a box ALREADY saturated from outside (e.g. a parallel full-suite
      // run) cannot show a 3x hog delta: the "uncontended" baseline is
      // itself contended, so the hogs' marginal share is small. That is
      // an environment precondition failure, not a suspects() bug —
      // cancel instead of flaking (observed once in an r16 full-suite
      // run: 0.85 s baseline vs 0.93 s hogged at box load > 8).
      cancel(s"box already contended (load ${BenchAdjudicate.loadAvg()}) " +
        s"- hog delta unmeasurable: uncontended $refT s, hogged $hotT s")
    }
    val ref = Map("spin" -> refT)
    val flagged = BenchAdjudicate.suspects(Seq("spin" -> hotT), ref,
      factor = 3.0, floor = math.min(0.3, refT))
    assert(flagged === Seq("spin"),
      s"hog must inflate past 3x: uncontended $refT s, contended $hotT s")
    // and a run that flagged a suspect never promotes itself to the
    // reference — the hogged run completes, its record is written, but the
    // idle-box baseline survives for the next run to adjudicate against
    assert(!BenchAdjudicate.promote(0.0, flagged, "/x", Some("/x"),
      subset = false))
  }

  test("reference files are keyed per scale factor") {
    // promote refuses cross-sf promotion (an sf1 run must not clobber the
    // operative sf0.1 record), so one shared ref file meant scaled runs
    // never self-adjudicated — every sf dir resolves its OWN reference
    assert(BenchAdjudicate.refPathFor("/root/testdata/sf0.1") ===
      "BENCH_ref.json") // the driver's operative sf keeps the legacy name
    assert(BenchAdjudicate.refPathFor("/tmp/sf1u") === "BENCH_ref_sf1u.json")
    assert(BenchAdjudicate.refPathFor("/tmp/sf10u") ===
      "BENCH_ref_sf10u.json")
    // distinct sf dirs must never alias to one file, and shell-hostile
    // characters in a dir name must not reach the file name
    assert(BenchAdjudicate.refPathFor("/tmp/SF 1;x") === "BENCH_ref_sf_1_x.json")
    assert(BenchAdjudicate.refPathFor("/a/sf1") !==
      BenchAdjudicate.refPathFor("/a/sf10"))
    // cross-sf refusal itself still holds (belt and braces: the per-sf
    // path makes the mismatch unreachable by default, the rule keeps an
    // explicit SPARK_GRAFT_BENCH_REF override honest)
    assert(!BenchAdjudicate.promote(0.0, Nil, "/tmp/sf1u",
      Some("/root/testdata/sf0.1"), subset = false))
    assert(BenchAdjudicate.promote(0.0, Nil, "/tmp/sf1u",
      Some("/tmp/sf1u"), subset = false))
  }
}
