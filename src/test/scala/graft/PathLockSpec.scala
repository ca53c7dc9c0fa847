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
