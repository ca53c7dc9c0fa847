package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

/**
 * In-JVM contract of [[GraftSession.withPathLock]]'s heartbeat lease:
 * liveness (a fresh heartbeat), not wall time, gates lease-breaking. The
 * pre-heartbeat design presumed any holder older than `leaseMs` dead —
 * under load a LIVE slow holder (recovery republication scales with store
 * size) was broken mid-critical-section (observed: a reader listing
 * mid-delete). The cross-process leg lives in [[CrossJvmConcurrencySpec]]
 * ("stalled-but-alive holder"); these threads pin the same rules cheaply
 * and deterministically in one JVM (the heartbeat/break mechanics are
 * identical — both sides see only the shared filesystem's mtime).
 */
class PathLockSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_lock").toString

  test("a live holder stalled well past the lease is NOT broken") {
    val s = spark.newSession()
    val dir = tmp()
    s.conf.set("spark.graft.pathLock.leaseMs", "1000")
    s.conf.set("spark.graft.pathLock.acquireTimeoutMs", "60000")
    try {
      val acquired = new CountDownLatch(1)
      val published = new java.util.concurrent.atomic.AtomicBoolean(false)
      val holderErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val holder = new Thread(() => {
        try GraftSession.withPathLock(s, dir) {
          acquired.countDown()
          // stall 4× the lease: the old fixed-lease contract broke this
          // holder after ~1 s; the heartbeat must keep it alive
          Thread.sleep(4000)
          published.set(true)
        } catch { case t: Throwable => holderErr.set(t); acquired.countDown() }
      })
      holder.start()
      assert(acquired.await(30, TimeUnit.SECONDS), "holder never acquired")
      assert(holderErr.get() == null, s"holder failed: ${holderErr.get()}")
      // contend for the whole stall — entry must come only after the
      // holder's publish landed
      GraftSession.withPathLock(s, dir) {
        assert(published.get(),
          "waiter entered before the live holder finished — the lease was " +
            "broken despite a fresh heartbeat")
      }
      holder.join(10000)
      assert(holderErr.get() == null, s"holder failed: ${holderErr.get()}")
    } finally {
      s.conf.unset("spark.graft.pathLock.leaseMs")
      s.conf.unset("spark.graft.pathLock.acquireTimeoutMs")
    }
  }

  test("a waiter gives up loudly after acquireTimeoutMs on a LIVE holder") {
    val s = spark.newSession()
    val dir = tmp()
    s.conf.set("spark.graft.pathLock.leaseMs", "1000")
    try {
      val acquired = new CountDownLatch(1)
      val release = new CountDownLatch(1)
      val holder = new Thread(() => {
        GraftSession.withPathLock(s, dir) {
          acquired.countDown()
          release.await(30, TimeUnit.SECONDS)
        }
      })
      holder.setDaemon(true)
      holder.start()
      assert(acquired.await(30, TimeUnit.SECONDS))
      s.conf.set("spark.graft.pathLock.acquireTimeoutMs", "1500")
      val e = intercept[IllegalStateException] {
        GraftSession.withPathLock(s, dir) { fail("must not enter") }
      }
      assert(e.getMessage.contains("LIVE writer"),
        s"give-up must name the live holder, got: ${e.getMessage}")
      release.countDown()
      holder.join(10000)
    } finally {
      s.conf.unset("spark.graft.pathLock.leaseMs")
      s.conf.unset("spark.graft.pathLock.acquireTimeoutMs")
    }
  }

  test("an abandoned lock (no heartbeat) is broken within one lease") {
    val s = spark.newSession()
    val dir = tmp()
    // simulate a crashed holder: a lock file nobody refreshes, mtime in
    // the past — the successor must break it and proceed
    new java.io.File(dir).mkdirs()
    val lock = new java.io.File(dir, "_graft.lock")
    assert(lock.createNewFile())
    lock.setLastModified(System.currentTimeMillis() - 5000)
    s.conf.set("spark.graft.pathLock.leaseMs", "1000")
    try {
      val t0 = System.nanoTime()
      var entered = false
      GraftSession.withPathLock(s, dir) { entered = true }
      assert(entered)
      assert((System.nanoTime() - t0) / 1e9 < 10.0,
        "breaking a dead holder must not wait out the acquire timeout")
      assert(!lock.exists(), "the successor must release cleanly")
    } finally s.conf.unset("spark.graft.pathLock.leaseMs")
  }

  // ---------------------------------------------------------------------
  // Store-level fencing: the residual hazard of any lease scheme is a
  // WHOLE-PROCESS stall (VM pause) longer than the lease — the frozen
  // holder resumes after a waiter broke the lock and its in-flight writes
  // would interleave with the successor's. The fence epoch in
  // `_graft.fence` + commit-point validation + reader-side quarantine
  // close it. heartbeatFreezeHook simulates the freeze deterministically.
  // ---------------------------------------------------------------------

  private def withFrozenFirstHolder(dirTag: String)(body: => Unit): Unit = {
    val frozen = new java.util.concurrent.atomic.AtomicReference[String](null)
    GraftSession.heartbeatFreezeHook = (p, tok) => {
      if (p.contains(dirTag)) {
        frozen.compareAndSet(null, tok)
        tok == frozen.get
      } else false
    }
    try body finally GraftSession.heartbeatFreezeHook = (_, _) => false
  }

  test("a frozen holder's publish is fenced at the commit point") {
    val s = spark.newSession()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_fence_commit").toString
    s.conf.set("spark.graft.pathLock.leaseMs", "500")
    try withFrozenFirstHolder("graft_fence_commit") {
      val acquired = new CountDownLatch(1)
      val broken = new CountDownLatch(1)
      val outcome = new java.util.concurrent.atomic.AtomicReference[Any]()
      val holder = new Thread(() => {
        try GraftSession.withPathLock(s, dir) {
          acquired.countDown()
          // "VM pause": the heartbeat is frozen by the hook; wait until
          // the successor has broken the lease, then try to publish
          assert(broken.await(30, TimeUnit.SECONDS))
          try {
            GraftSession.assertStoreFence(s, dir)
            outcome.set("published")
          } catch { case e: FencedLockException => outcome.set(e) }
        } catch { case t: Throwable => outcome.set(t); acquired.countDown() }
      })
      holder.start()
      assert(acquired.await(30, TimeUnit.SECONDS))
      // successor: breaks the stale heartbeat (frozen holder never
      // refreshes), bumps the fence, publishes, releases
      GraftSession.withPathLock(s, dir) {
        GraftSession.assertStoreFence(s, dir) // the LIVE holder passes
      }
      broken.countDown()
      holder.join(30000)
      assert(outcome.get().isInstanceOf[FencedLockException],
        s"the zombie's commit must be fenced, got: ${outcome.get()}")
    } finally s.conf.unset("spark.graft.pathLock.leaseMs")
  }

  test("readSample quarantines a zombie's same-batch files; readers never see them") {
    val s = spark.newSession()
    val g = new GraftSession(s)
    import s.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_fence_read").toString
    Seq("seed").toDF("event_type").createOrReplaceTempView("zz_base")
    g.sql("CREATE SAMPLE TABLE zz_sample ON zz_base OPTIONS(" +
      s"qcs 'event_type', fraction '1.0', path '$root/sample')")
    g.appendToSampleForBatch("zz_sample",
      Seq.fill(40)("zb0").toDF("event_type"), "zz_stream", 0L)
    val expected = g.readSample("zz_sample").count()
    // zombie residue: a lease-broken holder re-published batch 0 files
    // stamped with its SUPERSEDED epoch (here: a byte-copy of a real
    // batch-0 file under a lower `.e` tag — the duplicate-rows shape a
    // replayed publish leaves). Commit-point checks stop most of these;
    // this is the one that slipped through the microsecond window.
    val sampleDir = new java.io.File(s"$root/sample")
    val published = sampleDir.listFiles()
      .filter(f => f.getName.startsWith("stream-") &&
        f.getName.contains("-b0-")).head
    assert(published.getName.matches(".*\\.e[0-9]+\\.parquet"),
      s"publishes must be epoch-stamped: ${published.getName}")
    // the zombie's epoch is strictly OLDER than the batch's current one
    // (the successor that re-published acquired later, so its epoch is
    // higher by construction)
    val epoch = "\\.e([0-9]+)\\.parquet$".r
      .findFirstMatchIn(published.getName).get.group(1).toLong
    val zombieName = published.getName
      .replaceAll("-([0-9]+)\\.e[0-9]+\\.parquet$",
        s"-7.e${epoch - 1}.parquet")
    java.nio.file.Files.copy(published.toPath,
      new java.io.File(sampleDir, zombieName).toPath)
    // the strong reader: pinned snapshot excludes + quarantines the zombie
    assert(g.readSample("zz_sample").count() === expected,
      "readSample must not serve a superseded epoch's rows")
    assert(new java.io.File(sampleDir, s".fenced-$zombieName").exists(),
      "the zombie file must be quarantined under a dot prefix")
    assert(!new java.io.File(sampleDir, zombieName).exists())
    // the weak reader benefits too: dot-prefixed files are invisible
    assert(s.read.parquet(s"$root/sample").count() === expected)
    // and the next publish of that batch sweeps the quarantine with its
    // other leftovers (recovery owns the whole batch-prefix namespace)
    g.dropSampleTable("zz_sample")
  }

  test("a frozen TopK holder cannot clobber the successor's snapshot") {
    val s = spark.newSession()
    val g = new GraftSession(s)
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_fence_topk").toString
    Seq.fill(30)("k1").toDF("event_type")
      .createOrReplaceTempView("zz_topk_base")
    g.createTopK("zz_topk", "zz_topk_base", Map(
      "key" -> "event_type", "size" -> "5", "path" -> dir))
    val conf = s.sessionState.newHadoopConf()
    val metaFile = new java.io.File(dir, "_graft_topk.meta")
    s.conf.set("spark.graft.pathLock.leaseMs", "500")
    try withFrozenFirstHolder("graft_fence_topk") {
      val acquired = new CountDownLatch(1)
      val broken = new CountDownLatch(1)
      val outcome = new java.util.concurrent.atomic.AtomicReference[Any]()
      val holder = new Thread(() => {
        try GraftSession.withPathLock(s, dir) {
          acquired.countDown()
          assert(broken.await(30, TimeUnit.SECONDS))
          try outcome.set(g.saveTopK("zz_topk", dir))
          catch { case e: FencedLockException => outcome.set(e) }
        } catch { case t: Throwable => outcome.set(t); acquired.countDown() }
      })
      holder.start()
      assert(acquired.await(30, TimeUnit.SECONDS))
      GraftSession.withPathLock(s, dir) { () } // break + bump the fence
      val metaBefore = java.nio.file.Files.readAllBytes(metaFile.toPath)
      val versionBefore = GraftSession.readTopkSnapVersion(dir, conf)
      broken.countDown()
      holder.join(30000)
      assert(outcome.get().isInstanceOf[FencedLockException],
        s"the zombie's saveTopK must be fenced, got: ${outcome.get()}")
      assert(java.util.Arrays.equals(metaBefore,
        java.nio.file.Files.readAllBytes(metaFile.toPath)),
        "the zombie must not have replaced the meta")
      assert(GraftSession.readTopkSnapVersion(dir, conf) === versionBefore)
    } finally s.conf.unset("spark.graft.pathLock.leaseMs")
  }

  test("the heartbeat keeps the lock's mtime fresh while the holder runs") {
    val s = spark.newSession()
    val dir = tmp()
    s.conf.set("spark.graft.pathLock.leaseMs", "1000")
    try {
      GraftSession.withPathLock(s, dir) {
        val lock = new java.io.File(dir, "_graft.lock")
        Thread.sleep(2500) // several heartbeat periods (lease/4 = 250 ms)
        val age = System.currentTimeMillis() - lock.lastModified()
        assert(age < 1000,
          s"heartbeat must refresh the lock inside the lease (age $age ms)")
      }
    } finally s.conf.unset("spark.graft.pathLock.leaseMs")
  }
}
