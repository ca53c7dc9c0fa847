package graft

import java.util.concurrent.TimeUnit

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * TRUE multi-process concurrency over one shared persist path — separate
 * JVMs, separate SparkSessions, only the filesystem in common (the repo's
 * single-box analogue of the reference's dunit suites, e.g.
 * `tests/dunit/.../AQPCatalogConsistencyDUnitTest.scala`). The in-process
 * [[ConcurrentCatalogSpec]] races sessions inside ONE JVM; these scenarios
 * pin what only a real process boundary can show:
 *
 *  1. lease-break of a lock held by a genuinely DEAD process (its `finally`
 *     never ran — `Runtime.halt` mid-critical-section),
 *  2. RELOAD→MERGE→PUBLISH appends from two separate JVMs with no lost
 *     update, while a polling reader re-attaches torn-free, monotone
 *     snapshots throughout.
 */
class CrossJvmConcurrencySpec extends AnyFunSuite {
  import TestSpark._

  // mirrors build.sbt's jdk17AddOpens — a child JVM creating a SparkSession
  // outside spark-submit needs the same module opens
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private val javaBin = new java.io.File(
    new java.io.File(System.getProperty("java.home"), "bin"), "java")
    .getAbsolutePath

  private def launch(args: String*): (Process, java.io.File) = {
    val log = java.io.File.createTempFile("graft_xjvm_", ".log")
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx1500m", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.CrossJvmWorker") ++ args).toArray
    val p = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true)
      .redirectOutput(log)
      .start()
    (p, log)
  }

  private def freshSession(): (SparkSession, GraftSession) = {
    val s = spark.newSession()
    // temp views are session-scoped: every session needs the base view for
    // TopK attach/creation to resolve
    import s.implicits._
    Seq("seed_x", "seed_y").toDF("event_type")
      .createOrReplaceTempView("xjvm_base")
    (s, GraftSession(s))
  }

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def freshTimedSession(): (SparkSession, GraftSession) = {
    val s = spark.newSession()
    import s.implicits._
    Seq((0L, "seed_x"), (0L, "seed_y")).toDF("ts", "event_type")
      .createOrReplaceTempView("xjvm_base_t")
    (s, GraftSession(s))
  }

  test("a lock held by a DEAD process is lease-broken; the append proceeds") {
    val dir = tmpDir("graft_xjvm_l") + "/tk"
    val (sA, gA) = freshSession()
    import sA.implicits._
    gA.sql("CREATE TOPK TABLE xjvm_dead ON xjvm_base OPTIONS(" +
      s"key 'event_type', size '5', streamSummary 'true', " +
      s"capacity '100000', path '$dir')")

    val (p, log) = launch("hold-lock-and-die", dir)
    assert(p.waitFor(180, TimeUnit.SECONDS),
      s"lock-holder child did not exit; log: $log")
    assert(p.exitValue() === 7, s"child crashed differently; log: $log")
    val lock = new java.io.File(dir, "_graft.lock")
    assert(lock.exists(),
      "the dead holder's lock file must survive its crash (finally skipped)")

    // short lease so the test doesn't sit out the 120 s default; the file's
    // mtime is the dead child's acquisition time
    sA.conf.set("spark.graft.pathLock.leaseMs", "2000")
    try {
      Thread.sleep(2500)
      gA.appendToTopK("xjvm_dead", Seq.fill(60)("xjvm_m").toDF("event_type"))
      assert(gA.queryFrequency("xjvm_dead", "xjvm_m").map(_._2) === Some(60L),
        "the append must go through once the dead holder's lease is broken")
    } finally sA.conf.unset("spark.graft.pathLock.leaseMs")

    // and the breaker released properly: a second append needs no lease wait
    val t0 = System.nanoTime()
    gA.appendToTopK("xjvm_dead", Seq.fill(40)("xjvm_m").toDF("event_type"))
    assert(gA.queryFrequency("xjvm_dead", "xjvm_m").map(_._2) === Some(100L))
    assert((System.nanoTime() - t0) / 1e9 < 60.0, "no stale lock left behind")
  }

  test("a stalled-but-alive holder in another JVM is NOT lease-broken") {
    // the dual of the dead-holder leg: the holder is alive but slow (its
    // critical section runs 6× the 1 s lease — recovery republication at
    // scale does exactly this). Its daemon heartbeat keeps the lock's
    // mtime fresh, so the contending parent may NOT break it: entry must
    // come only after the holder's publish landed. Before heartbeat
    // renewal this exact shape failed under load (r13, c62bdcd) and was
    // worked around by raising the lease constant.
    val dir = tmpDir("graft_xjvm_hb") + "/p"
    new java.io.File(dir).mkdirs()
    val acq = java.io.File.createTempFile("graft_hb_acq", ".flag")
    val pub = java.io.File.createTempFile("graft_hb_pub", ".flag")
    acq.delete(); pub.delete()
    val (p, log) = launch("hold-lock-stall", dir, "6000",
      acq.getAbsolutePath, pub.getAbsolutePath)
    val waitDeadline = System.currentTimeMillis() + 120000
    while (!acq.exists() && p.isAlive &&
        System.currentTimeMillis() < waitDeadline) Thread.sleep(100)
    assert(acq.exists(), s"holder never acquired the lock; log: $log")

    val (sA, _) = freshSession()
    sA.conf.set("spark.graft.pathLock.leaseMs", "1000")
    sA.conf.set("spark.graft.pathLock.acquireTimeoutMs", "90000")
    try {
      GraftSession.withPathLock(sA, dir) {
        assert(pub.exists(),
          "parent entered before the live holder finished — the lease was " +
            s"broken despite a fresh cross-process heartbeat; log: $log")
      }
    } finally {
      sA.conf.unset("spark.graft.pathLock.leaseMs")
      sA.conf.unset("spark.graft.pathLock.acquireTimeoutMs")
    }
    assert(p.waitFor(60, TimeUnit.SECONDS), s"holder did not exit; log: $log")
    assert(p.exitValue() === 0, s"holder failed; log: $log")
  }

  test("a frozen holder in another JVM is fenced; its slipped write is quarantined") {
    // the store-level-fencing dual of the stalled-but-alive leg: the
    // holder's WHOLE PROCESS freezes (heartbeat included), so the parent
    // correctly breaks the lease and republishes — and the zombie's late
    // writes must then (a) be fenced at its commit points and (b) be
    // quarantined by readers when one slipped through first. Cross-JVM
    // because the fence protocol is all shared-filesystem state.
    val root = tmpDir("graft_xjvm_fence")
    val (s, gs) = freshSession()
    import s.implicits._
    Seq("seed").toDF("event_type").createOrReplaceTempView("xf_base")
    gs.sql("CREATE SAMPLE TABLE xf_sample ON xf_base OPTIONS(" +
      s"qcs 'event_type', fraction '1.0', path '$root/sample')")
    gs.appendToSampleForBatch("xf_sample",
      Seq.fill(30)("xb0").toDF("event_type"), "xf_stream", 0L)
    val acq = java.io.File.createTempFile("graft_zf_acq", ".flag")
    val proceed = java.io.File.createTempFile("graft_zf_go", ".flag")
    acq.delete(); proceed.delete()
    val (p, log) = launch("hold-lock-frozen", s"$root/sample",
      acq.getAbsolutePath, proceed.getAbsolutePath)
    val waitDeadline = System.currentTimeMillis() + 120000
    while (!acq.exists() && p.isAlive &&
      System.currentTimeMillis() < waitDeadline) Thread.sleep(100)
    assert(acq.exists(), s"frozen holder never acquired; log: $log")
    // successor: break the stale heartbeat (frozen process never
    // refreshes) and publish batch 1 under a NEWER fence epoch
    s.conf.set("spark.graft.pathLock.leaseMs", "800")
    s.conf.set("spark.graft.pathLock.acquireTimeoutMs", "60000")
    try {
      gs.appendToSampleForBatch("xf_sample",
        Seq.fill(20)("xb1").toDF("event_type"), "xf_stream", 1L)
      val expected = gs.readSample("xf_sample").count()
      proceed.createNewFile()
      assert(p.waitFor(120, TimeUnit.SECONDS), s"zombie did not exit; log: $log")
      val out = new String(java.nio.file.Files.readAllBytes(log.toPath))
      assert(out.contains("ZOMBIE-WROTE"), s"zombie never landed its file; log: $log")
      assert(out.contains("FENCED"), s"zombie commit was not fenced; log: $log")
      assert(!out.contains("ZOMBIE-PUBLISH-ALLOWED"), s"fence let a zombie through; log: $log")
      // the slipped file is ignored and quarantined by the strong reader
      assert(gs.readSample("xf_sample").count() === expected,
        "readSample served a superseded epoch's rows")
      val quarantined = new java.io.File(s"$root/sample").listFiles()
        .filter(_.getName.startsWith(".fenced-stream-"))
      assert(quarantined.nonEmpty, "the zombie file was not quarantined")
      assert(s.read.parquet(s"$root/sample").count() === expected)
    } finally {
      s.conf.unset("spark.graft.pathLock.leaseMs")
      s.conf.unset("spark.graft.pathLock.acquireTimeoutMs")
    }
  }

  test("appends from two separate JVMs serialize; polling attaches are torn-free") {
    val dir = tmpDir("graft_xjvm_r") + "/tk"
    val (sA, gA) = freshSession()
    import sA.implicits._
    gA.sql("CREATE TOPK TABLE xjvm_tk ON xjvm_base OPTIONS(" +
      s"key 'event_type', size '5', streamSummary 'true', " +
      s"capacity '100000', path '$dir')")

    val (pa, logA) = launch("append-topk", dir, "xjvm_a", "12", "10")
    val (pb, logB) = launch("append-topk", dir, "xjvm_b", "8", "10")

    // poll fresh attaches while the children publish: every observed count
    // is a whole number of batches (torn-free) and nondecreasing (each
    // publish contains its predecessors)
    var lastA, lastB = 0L
    var polls = 0
    val deadline = System.currentTimeMillis() + 240000
    while ((pa.isAlive || pb.isAlive) && System.currentTimeMillis() < deadline) {
      val (_, gP) = freshSession()
      gP.sql("CREATE TOPK TABLE IF NOT EXISTS xjvm_poll ON xjvm_base OPTIONS(" +
        s"key 'event_type', size '5', streamSummary 'true', " +
        s"capacity '100000', path '$dir')")
      val a = gP.queryFrequency("xjvm_poll", "xjvm_a").map(_._2).getOrElse(0L)
      val b = gP.queryFrequency("xjvm_poll", "xjvm_b").map(_._2).getOrElse(0L)
      assert(a % 10 === 0L, s"torn read of xjvm_a: $a")
      assert(b % 10 === 0L, s"torn read of xjvm_b: $b")
      assert(a >= lastA && b >= lastB,
        s"snapshot went backwards: a $lastA->$a, b $lastB->$b")
      lastA = a; lastB = b; polls += 1
      Thread.sleep(300)
    }
    assert(pa.waitFor(60, TimeUnit.SECONDS) && pa.exitValue() === 0,
      s"writer A failed; log: $logA")
    assert(pb.waitFor(60, TimeUnit.SECONDS) && pb.exitValue() === 0,
      s"writer B failed; log: $logB")
    assert(polls > 0, "the poller must observe at least one live snapshot")

    // final attach: no lost update across the process boundary, seeds intact
    val (_, gD) = freshSession()
    gD.sql("CREATE TOPK TABLE IF NOT EXISTS xjvm_done ON xjvm_base OPTIONS(" +
      s"key 'event_type', size '5', streamSummary 'true', " +
      s"capacity '100000', path '$dir')")
    assert(gD.queryFrequency("xjvm_done", "xjvm_a").map(_._2) === Some(120L),
      "JVM A's appends must all survive B's publishes")
    assert(gD.queryFrequency("xjvm_done", "xjvm_b").map(_._2) === Some(80L),
      "JVM B's appends must all survive A's publishes")
    assert(gD.queryFrequency("xjvm_done", "seed_x").map(_._2) === Some(1L),
      "base counts must be unchanged by cross-process appends")
  }

  test("interleaved batch-timed combined appends from two JVMs match the exact model") {
    // the r9 blind spot: every cross-process append test so far was
    // MONOTONE and DISJOINT per writer (the single-writer shape that hid
    // the dyadic-carry bug for seven rounds). Here both JVMs append the
    // SAME keys into one OVERLAPPING interval range, non-monotonically
    // (late re-appends into intervals the other writer has aged, pre-epoch
    // negatives), batch-timed with an explicit declared epoch, while the
    // driver guard forces spills — and the final snapshot must carry
    // exactly the summed mass of both deterministic plans.
    val dir = tmpDir("graft_xjvm_f") + "/tk"
    val sA = spark.newSession()
    import sA.implicits._
    Seq.empty[String].toDF("event_type").createOrReplaceTempView("xjvm_base_f")
    val gA = GraftSession(sA)
    gA.sql("CREATE TOPK TABLE xjvm_tk_f ON xjvm_base_f OPTIONS(" +
      s"key 'event_type', size '4', depth '5', width '2048', " +
      s"timeInterval '1000', maxInterval '4', epoch '0', " +
      s"timeAndItemAggregation 'true', timeUnit 'ms', " +
      s"maxDriverEntries '60000', path '$dir')")

    val ivMs = 1000L
    val ivRange = 24
    val batches = 15
    val flagA = java.io.File.createTempFile("graft_xjvm_spill_a", ".flag")
    val flagB = java.io.File.createTempFile("graft_xjvm_spill_b", ".flag")
    flagA.delete(); flagB.delete()
    val (pa, logA) = launch("append-topk-fuzz", dir, "1101",
      batches.toString, ivRange.toString, ivMs.toString, flagA.getAbsolutePath)
    val (pb, logB) = launch("append-topk-fuzz", dir, "2202",
      batches.toString, ivRange.toString, ivMs.toString, flagB.getAbsolutePath)

    // mid-flight: per-key totals only ever grow (mass is only added)
    val lastSeen = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    val deadline = System.currentTimeMillis() + 240000
    while ((pa.isAlive || pb.isAlive) && System.currentTimeMillis() < deadline) {
      val sP = spark.newSession()
      locally { import sP.implicits._
        Seq.empty[String].toDF("event_type")
          .createOrReplaceTempView("xjvm_base_f") }
      val gP = GraftSession(sP)
      gP.sql(s"CREATE TOPK TABLE IF NOT EXISTS xjvm_poll_f ON xjvm_base_f " +
        s"OPTIONS(path '$dir')")
      CrossJvmWorker.FuzzKeys.foreach { k =>
        val est = gP.queryFrequency("xjvm_poll_f", k).map(_._2).getOrElse(0L)
        assert(est >= lastSeen(k), s"snapshot went backwards for $k")
        lastSeen(k) = est
      }
      GraftState.of(sP).topks.remove("xjvm_poll_f")
      GraftState.of(sP).topkPaths.remove("xjvm_poll_f")
      Thread.sleep(300)
    }
    assert(pa.waitFor(60, TimeUnit.SECONDS) && pa.exitValue() === 0,
      s"writer A failed; log: $logA")
    assert(pb.waitFor(60, TimeUnit.SECONDS) && pb.exitValue() === 0,
      s"writer B failed; log: $logB")
    assert(flagA.exists() || flagB.exists(),
      "neither writer ever spilled — lower the driver guard")

    // exact model: replay both writers' deterministic plans and sum
    val model = scala.collection.mutable.Map.empty[(Long, String), Long]
      .withDefaultValue(0L)
    Seq(1101L, 2202L).foreach { seed =>
      CrossJvmWorker.fuzzPlan(seed, batches, ivRange, ivMs).foreach {
        case (bt, counts) =>
          val iv = Math.floorDiv(bt, ivMs)
          counts.foreach { case (k, n) => model((iv, k)) += n.toLong }
      }
    }
    def truth(iv0: Long, iv1: Long, k: String): Long =
      model.iterator.collect { case ((iv, kk), n)
        if kk == k && iv >= iv0 && iv <= iv1 => n }.sum

    val sD = spark.newSession()
    locally { import sD.implicits._
      Seq.empty[String].toDF("event_type")
        .createOrReplaceTempView("xjvm_base_f") }
    val gD = GraftSession(sD)
    gD.sql(s"CREATE TOPK TABLE IF NOT EXISTS xjvm_done_f ON xjvm_base_f " +
      s"OPTIONS(path '$dir')")
    // full-range identity: no interleaving may lose or double mass
    CrossJvmWorker.FuzzKeys.foreach { k =>
      val total = truth(Long.MinValue, Long.MaxValue, k)
      gD.queryFrequency("xjvm_done_f", k) match {
        case Some((lo, est, up)) =>
          assert(est === total, s"full-range $k: $est != $total")
          assert(lo <= total && total <= up, s"full-range bounds $k")
        case None => assert(total === 0L, s"$k: None with model mass $total")
      }
    }
    // windowed: truth within bounds for a sweep of windows (spilled run,
    // so bounds — exactness is the single-JVM fuzz's job)
    for (a <- -2L until ivRange.toLong by 3; len <- Seq(0L, 2L, 7L)) {
      val (t0, t1) = (a * ivMs, (a + len + 1) * ivMs - 1)
      CrossJvmWorker.FuzzKeys.foreach { k =>
        val tr = truth(a, a + len, k)
        gD.queryFrequency("xjvm_done_f", k, t0, t1) match {
          case Some((lo, est, up)) =>
            assert(tr <= up, s"window [$a,+$len] $k: truth $tr above $up")
            assert(lo <= est && est <= up, s"window [$a,+$len] $k bound order")
          case None => assert(tr === 0L, s"window [$a,+$len] $k: None, mass $tr")
        }
      }
    }
  }

  test("combined-mode snapshots (blocks + spill store) survive two-JVM appends") {
    // the timeAndItemAggregation structure rides the persisted snapshot:
    // per-interval shrinking sketches, full-width dyadic history blocks,
    // the trailing mode flag, and — once the small driver guard trips —
    // the spill store, all RELOAD→MERGE→PUBLISHed by two separate JVMs
    // appending to DISJOINT day ranges
    val dir = tmpDir("graft_xjvm_t") + "/tk"
    val (_, gA) = freshTimedSession()
    gA.sql("CREATE TOPK TABLE xjvm_tk_t ON xjvm_base_t OPTIONS(" +
      s"key 'event_type', size '5', depth '2', width '256', " +
      s"timeSeriesColumn 'ts', timeInterval '86400000', maxInterval '4', " +
      s"timeAndItemAggregation 'true', timeUnit 'ms', " +
      s"maxDriverEntries '1500', path '$dir')")

    val (pa, logA) = launch("append-topk-timed", dir, "xjvm_a", "10", "10", "0")
    val (pb, logB) = launch("append-topk-timed", dir, "xjvm_b", "10", "10", "100")

    var lastA, lastB = 0L
    var polls = 0
    val deadline = System.currentTimeMillis() + 240000
    while ((pa.isAlive || pb.isAlive) && System.currentTimeMillis() < deadline) {
      val (sP, gP) = freshTimedSession()
      gP.sql("CREATE TOPK TABLE IF NOT EXISTS xjvm_poll_t ON xjvm_base_t OPTIONS(" +
        s"path '$dir')")
      val a = gP.queryFrequency("xjvm_poll_t", "xjvm_a").map(_._2).getOrElse(0L)
      val b = gP.queryFrequency("xjvm_poll_t", "xjvm_b").map(_._2).getOrElse(0L)
      assert(a % 10 === 0L, s"torn read of xjvm_a: $a")
      assert(b % 10 === 0L, s"torn read of xjvm_b: $b")
      assert(a >= lastA && b >= lastB,
        s"snapshot went backwards: a $lastA->$a, b $lastB->$b")
      lastA = a; lastB = b; polls += 1
      GraftState.of(sP).topks.remove("xjvm_poll_t")
      GraftState.of(sP).topkPaths.remove("xjvm_poll_t")
      Thread.sleep(300)
    }
    assert(pa.waitFor(60, TimeUnit.SECONDS) && pa.exitValue() === 0,
      s"writer A failed; log: $logA")
    assert(pb.waitFor(60, TimeUnit.SECONDS) && pb.exitValue() === 0,
      s"writer B failed; log: $logB")
    assert(polls > 0, "the poller must observe at least one live snapshot")

    val (sD, gD) = freshTimedSession()
    gD.sql(s"CREATE TOPK TABLE IF NOT EXISTS xjvm_done_t ON xjvm_base_t " +
      s"OPTIONS(path '$dir')")
    val st = GraftState.of(sD).topks("xjvm_done_t")
      .asInstanceOf[graft.topk.TopKState]
    assert(st.opts.timeAndItemAggregation && st.buckets.timeAndItem,
      "the combined mode must survive the cross-process meta round-trip")
    assert(gD.queryFrequency("xjvm_done_t", "xjvm_a").map(_._2) === Some(100L),
      "JVM A's timed appends must all survive B's publishes")
    assert(gD.queryFrequency("xjvm_done_t", "xjvm_b").map(_._2) === Some(100L),
      "JVM B's timed appends must all survive A's publishes")
    // windowed: one day from each writer's disjoint range stays exact
    val dayMs = 86400000L
    assert(gD.queryFrequency("xjvm_done_t", "xjvm_a",
      3L * dayMs, 4L * dayMs - 1).map(_._2) === Some(10L))
    assert(gD.queryFrequency("xjvm_done_t", "xjvm_b",
      103L * dayMs, 104L * dayMs - 1).map(_._2) === Some(10L))
  }

  test("streaming crash-resume: SIGKILLed populator resumes exactly-once") {
    // The streaming analogue of the APPEND-interleaving fuzz: a populator
    // JVM is SIGKILLed at random points — mid micro-batch, between
    // dependent population and the checkpoint's offset commit, mid
    // snapshot publish, while holding a path lock — then a FRESH JVM
    // resumes the same stream. foreachBatch is at-least-once, so without
    // the per-stream batch watermarks (persisted atomically with each
    // structure's own state) every kill-after-populate would double-feed
    // the replayed batch. The exact model is the input multiset: history,
    // the fraction-1.0 sample, and the StreamSummary TopK must each hold
    // every input row EXACTLY once at quiescence — no re-ingest, no loss.
    val root = tmpDir("graft_xjvm_sr")
    new java.io.File(root, "in").mkdirs()
    val rnd = new scala.util.Random(424242L)
    val keys = CrossJvmWorker.FuzzKeys
    val s = spark.newSession()
    import s.implicits._
    var total = 0L
    val model = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    (0 until 12).foreach { b =>
      val rows = keys.flatMap { k =>
        val n = 1 + rnd.nextInt(5)
        model(k) += n; total += n
        Seq.fill(n)(k)
      }
      // one flat parquet FILE per micro-batch (maxFilesPerTrigger=1):
      // stage a single-part write, then move the part file into the
      // source dir under a stable name
      val stage = java.nio.file.Files.createTempDirectory("graft_sr_stage")
      rows.toDF("event_type").coalesce(1)
        .write.mode("overwrite").parquet(stage.toString)
      val part = new java.io.File(stage.toString).listFiles()
        .find(f => f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(root, "in", f"batch_$b%02d.parquet"))
    }

    val doneFlag = new java.io.File(root, "done")
    var kills = 0
    var attempts = 0
    while (!doneFlag.exists() && attempts < 10) {
      attempts += 1
      val (p, log) = launch("stream-populate", root, total.toString,
        doneFlag.getAbsolutePath)
      if (kills < 3) {
        // SIGKILL at a random point genuinely MID-INGEST: wait for the
        // first populated batch to appear (a fixed early delay would
        // mostly kill JVM/Spark startup, which exercises nothing), then
        // kill inside the batch cadence — destroyForcibly skips every
        // shutdown hook, finally block and lock release, like a crashed
        // executor host
        val firstBatch = new java.io.File(s"$root/history/__graft_batch=0")
        val w0 = System.currentTimeMillis()
        while (!firstBatch.exists() && !doneFlag.exists() &&
          System.currentTimeMillis() - w0 < 60000 && p.isAlive) {
          Thread.sleep(150)
        }
        Thread.sleep(rnd.nextInt(4000))
        if (!doneFlag.exists()) {
          p.destroyForcibly()
          p.waitFor(30, TimeUnit.SECONDS)
          kills += 1
        } else {
          assert(p.waitFor(60, TimeUnit.SECONDS) && p.exitValue() === 0,
            s"worker failed after completion; log: $log")
        }
      } else {
        assert(p.waitFor(240, TimeUnit.SECONDS),
          s"resumed worker stalled; log: $log")
        assert(p.exitValue() === 0, s"resumed worker failed; log: $log")
      }
    }
    assert(kills >= 3, s"the fuzz must actually kill mid-ingest ($kills kills)")
    assert(doneFlag.exists(), "populator never reached quiescence")

    // exact model, all three persistent surfaces
    val sf = spark.newSession()
    def countsOf(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.groupBy("event_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hist = countsOf(sf.read.parquet(s"$root/history"))
    assert(hist === model.toMap,
      s"history must hold every row exactly once: $hist vs $model")
    val sample = countsOf(sf.read.parquet(s"$root/sample"))
    assert(sample === model.toMap,
      s"fraction-1.0 sample must hold every row exactly once: $sample vs $model")
    val gf = GraftSession(sf)
    gf.attachTopKTable("xjvm_sr_check", s"$root/topk")
    keys.foreach { k =>
      assert(gf.queryFrequency("xjvm_sr_check", k).map(_._2) === Some(model(k)),
        s"TopK count for $k must match the exact model")
    }
  }

  test("two streams into ONE sample + ONE TopK survive interleaved kills exactly-once") {
    // the r11 fuzz drove a single stream; the watermark design is
    // PER-STREAM (appliedStreamBatch(streamName) / __streambatch.<stream>),
    // and this is the shape that breaks if the fences ever share a key:
    // both sinks have their own batch-id sequence, so stream A's batch N
    // must never fence out stream B's batch N. Inputs are static; at
    // quiescence the sample and the TopK must hold the exact UNION
    // multiset of both input dirs across ≥3 SIGKILL/resume cycles.
    val root = tmpDir("graft_xjvm_two")
    new java.io.File(root, "in_a").mkdirs()
    new java.io.File(root, "in_b").mkdirs()
    val rnd = new scala.util.Random(77177L)
    val s = spark.newSession()
    import s.implicits._
    val model = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    def writeBatches(sub: String, prefix: String, batches: Int): Unit =
      (0 until batches).foreach { b =>
        val rows = (0 until 4).flatMap { i =>
          val k = s"${prefix}_k$i"
          val n = 1 + rnd.nextInt(5)
          model(k) += n
          Seq.fill(n)(k)
        }
        val stage = java.nio.file.Files.createTempDirectory("graft_two_stage")
        rows.toDF("event_type").coalesce(1)
          .write.mode("overwrite").parquet(stage.toString)
        val part = new java.io.File(stage.toString).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(root, sub, f"batch_$b%02d.parquet"))
      }
    writeBatches("in_a", "two_a", 8)
    writeBatches("in_b", "two_b", 8)

    def publishedSampleFiles(): Int = {
      val d = new java.io.File(root, "sample")
      if (!d.isDirectory) 0
      else d.listFiles().count(_.getName.startsWith("stream-"))
    }
    val doneFlag = new java.io.File(root, "done")
    var kills = 0
    var attempts = 0
    while (!doneFlag.exists() && attempts < 10) {
      attempts += 1
      val (p, log) = launch("stream-populate-two", root,
        doneFlag.getAbsolutePath)
      if (kills < 3) {
        // kill only once THIS launch has visibly published sample files
        // beyond its start point — a fixed delay would mostly kill Spark
        // startup and exercise nothing
        val base = publishedSampleFiles()
        val w0 = System.currentTimeMillis()
        while (publishedSampleFiles() <= base && !doneFlag.exists() &&
          System.currentTimeMillis() - w0 < 90000 && p.isAlive) {
          Thread.sleep(150)
        }
        Thread.sleep(rnd.nextInt(3000))
        if (!doneFlag.exists()) {
          p.destroyForcibly()
          p.waitFor(30, TimeUnit.SECONDS)
          kills += 1
        } else {
          assert(p.waitFor(60, TimeUnit.SECONDS) && p.exitValue() === 0,
            s"worker failed after completion; log: $log")
        }
      } else {
        assert(p.waitFor(300, TimeUnit.SECONDS),
          s"resumed worker stalled; log: $log")
        // exit 3 = the worker's own deadline fired before quiescence —
        // expected on a loaded box (four streaming queries in one small
        // JVM); the exactly-once property is about the FINAL state, so
        // relaunch and keep going. Any other non-zero exit is a real bug.
        assert(p.exitValue() === 0 || p.exitValue() === 3,
          s"resumed worker failed; log: $log")
      }
    }
    assert(kills >= 3, s"the fuzz must actually kill mid-ingest ($kills kills)")
    assert(doneFlag.exists(), "populator never reached quiescence")

    val sf = spark.newSession()
    val sample = sf.read.parquet(s"$root/sample")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sample === model.toMap,
      s"sample must hold both streams' rows exactly once: $sample vs $model")
    val gf = GraftSession(sf)
    gf.attachTopKTable("xjvm_two_check", s"$root/topk")
    model.foreach { case (k, n) =>
      assert(gf.queryFrequency("xjvm_two_check", k).map(_._2) === Some(n),
        s"TopK count for $k must match the union model")
    }
  }

  test("a reader overlapping a crashed batch's recovery republication never sees duplicates") {
    // appendToSampleForBatch's recovery (delete-by-prefix → stage → rename
    // → meta watermark) is atomic for WRITERS via the path lock; plain
    // parquet readers don't take it. The pinned contract: a reader racing
    // the republication may transiently MISS the recovering batch's rows
    // (between the prefix delete and the renames) or fail the read outright
    // (a listed file vanished) — it must NEVER observe duplicated rows or a
    // count that isn't a consistent prefix of published batches.
    val gs = new GraftSession(spark)
    import spark.implicits._
    val root = tmpDir("graft_reader_rec")
    Seq("rr_seed").toDF("event_type").createOrReplaceTempView("rr_base")
    gs.sql("CREATE SAMPLE TABLE rr_sample ON rr_base OPTIONS(" +
      s"qcs 'event_type', fraction '1.0', path '$root/sample')")
    val createRows = spark.read.parquet(s"$root/sample").count()
    val b0 = Seq.fill(40)("rr_b0").toDF("event_type")
    val b1 = Seq.fill(25)("rr_b1").toDF("event_type")
    gs.appendToSampleForBatch("rr_sample", b0, "rr_stream", 0L)
    gs.appendToSampleForBatch("rr_sample", b1, "rr_stream", 1L)
    val full = createRows + 40 + 25
    val conf = spark.sessionState.newHadoopConf()

    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    var observedMiss = false
    val reader = new Thread(() => {
      val rs = spark.newSession()
      while (!stop.get()) {
        try {
          rs.catalog.refreshByPath(s"$root/sample")
          val n = rs.read.parquet(s"$root/sample").count()
          // allowed states: full store, or the recovering batch-0 absent
          if (n == full - 40) observedMiss = true
          else if (n != full) bad.add(s"inconsistent count $n (full $full)")
          if (n > full) bad.add(s"DUPLICATED rows: $n > $full")
        } catch { case _: Exception => () } // transient read failure: allowed
      }
    })
    // the STRONG reader: readSample pins a lock-consistent file snapshot,
    // so unlike the plain reader above it must NEVER observe the
    // transient-miss state (count full-40) — read failures while the
    // writer churns the same batch stay allowed (they surface loudly and
    // the caller retries; silent row loss is the bug class under test)
    var snapReads = 0L
    val snapBad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val snapReader = new Thread(() => {
      while (!stop.get()) {
        try {
          val n = gs.readSample("rr_sample").count()
          snapReads += 1
          if (n != full) snapBad.add(s"snapshot reader saw $n (full $full)")
        } catch { case _: Exception => () } // loud transient failure: allowed
      }
    })
    reader.start()
    snapReader.start()
    try {
      // repeatedly re-enter the crash-recovery path for batch 0: roll the
      // watermark back (what a crash between the renames and the meta
      // publish leaves behind) and let the fenced append republish while
      // the reader races it
      (0 until 25).foreach { _ =>
        GraftSession.updateSampleMetaProp(s"$root/sample",
          "__streambatch.rr_stream", "-1", conf)
        gs.appendToSampleForBatch("rr_sample", b0, "rr_stream", 0L)
      }
    } finally {
      stop.set(true)
      reader.join(30000)
      snapReader.join(30000)
    }
    assert(bad.isEmpty, s"reader anomalies: ${bad.toArray.mkString("; ")}")
    assert(snapBad.isEmpty,
      s"snapshot-reader anomalies: ${snapBad.toArray.mkString("; ")}")
    assert(snapReads > 0, "snapshot reader must complete reads under churn")
    // CROSS-JVM leg of the same contract: a reader in a REAL separate
    // process takes the lock FILE (lease path), not the same-JVM fast
    // path the threads above share — its snapshot listing must serialize
    // against this JVM's recovery republication through the file lease
    // alone. The worker exits 5 on any count that is not the full store.
    val (wp, wlog) = launch("read-sample-snapshot", root,
      full.toString, "25000")
    // hold churn until the worker has attached (flag file): the contract
    // under test is reads-during-recovery; attach happens during normal
    // operation, and churning through the worker's slow cold start only
    // starves its attach on a loaded box
    val attachedFlag = new java.io.File(root, "attached.flag")
    val attachWait = System.currentTimeMillis() + 120000
    while (!attachedFlag.exists() && wp.isAlive &&
        System.currentTimeMillis() < attachWait) Thread.sleep(200)
    assert(attachedFlag.exists(), "cross-JVM reader never attached")
    // churn recovery for the FIRST part of the worker's read window only:
    // reads racing the churn must never return a wrong count (loud
    // failures allowed — the caller-retries contract), and the quiescent
    // tail guarantees at least one CLEAN read completes even on a loaded
    // box, so the worker's zero-reads guard stays conclusive
    val churnUntil = System.currentTimeMillis() + 15000
    while (wp.isAlive && System.currentTimeMillis() < churnUntil) {
      GraftSession.updateSampleMetaProp(s"$root/sample",
        "__streambatch.rr_stream", "-1", conf)
      gs.appendToSampleForBatch("rr_sample", b0, "rr_stream", 0L)
      // recovery in production is a one-shot event after a crash; pace the
      // artificial churn so the reader gets windows where a count job can
      // complete between two republications
      Thread.sleep(400)
    }
    assert(wp.waitFor(60, java.util.concurrent.TimeUnit.SECONDS),
      "cross-JVM reader did not exit")
    val wout = scala.io.Source.fromFile(wlog).mkString
    assert(wp.exitValue() === 0,
      s"cross-JVM snapshot reader anomaly (exit ${wp.exitValue()}): $wout")
    assert(wout.contains("clean reads"), s"worker log malformed: $wout")
    // recovery converges: exactly one copy of every batch at quiescence
    spark.catalog.refreshByPath(s"$root/sample")
    import org.apache.spark.sql.functions.col
    val finalRows = spark.read.parquet(s"$root/sample")
    assert(finalRows.count() === full)
    assert(finalRows.filter(col("event_type") === "rr_b0").count() === 40)
    assert(finalRows.filter(col("event_type") === "rr_b1").count() === 25)
    gs.sql("DROP SAMPLE TABLE rr_sample")
  }
}
