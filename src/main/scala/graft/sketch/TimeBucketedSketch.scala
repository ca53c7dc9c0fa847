package graft.sketch

import scala.collection.mutable

/** A sketch of either family, per time interval. */
object IntervalSketch {
  /** Tagged byte form (0 = CMS, 1 = StreamSummary) — the wire format of
   * [[org.apache.spark.sql.graft.SketchAggregate]] buffers and the unit the
   * Kryo serializers delegate to. */
  def toBytes(s: IntervalSketch): Array[Byte] = s match {
    case CmsInterval(c) =>
      val b = c.serialized
      val out = new Array[Byte](b.length + 1); out(0) = 0
      System.arraycopy(b, 0, out, 1, b.length); out
    case SummaryInterval(ss) =>
      val b = ss.serialized
      val out = new Array[Byte](b.length + 1); out(0) = 1
      System.arraycopy(b, 0, out, 1, b.length); out
  }

  def fromBytes(bytes: Array[Byte]): IntervalSketch = {
    val body = java.util.Arrays.copyOfRange(bytes, 1, bytes.length)
    if (bytes(0) == 0.toByte) CmsInterval(TopKCms.deserialize(body))
    else SummaryInterval(StreamSummary.deserialize(body))
  }
}

sealed trait IntervalSketch extends Serializable {
  def mergeWith(o: IntervalSketch): IntervalSketch
  def topK(n: Int): Seq[(Any, Long, Long)]
  def estimate(key: Any): (Long, Long, Long) // (lower, estimate, upper)
  /** Actual driver-held counters/cells (for the TopK driver-memory guard). */
  def entryCount: Long
  /** Item-aggregation fold: halve the memory footprint at reduced
   * precision (Hokusai's ĉ). */
  def compressed: IntervalSketch
  /** Whether a further [[compressed]] step is possible/worthwhile. */
  def compressible(minWidth: Int): Boolean
}

final case class CmsInterval(s: TopKCms) extends IntervalSketch {
  def mergeWith(o: IntervalSketch): IntervalSketch =
    CmsInterval(s.merge(o.asInstanceOf[CmsInterval].s))
  def topK(n: Int): Seq[(Any, Long, Long)] = s.topK(n)
  def estimate(key: Any): (Long, Long, Long) = {
    val a = s.estimate(key); (a.lowerBound, a.estimate, a.max)
  }
  def compressed: IntervalSketch = CmsInterval(s.compressed)
  def compressible(minWidth: Int): Boolean =
    s.cms.width % 2 == 0 && s.cms.width / 2 >= minWidth
  def entryCount: Long = s.cms.depth.toLong * s.cms.width + s.candidates.size
}

final case class SummaryInterval(s: StreamSummary) extends IntervalSketch {
  def mergeWith(o: IntervalSketch): IntervalSketch =
    SummaryInterval(s.merge(o.asInstanceOf[SummaryInterval].s))
  def topK(n: Int): Seq[(Any, Long, Long)] =
    s.topK(n).map { case (k, c, e) => (k, c, c - e) } // lower bound = c − e
  def estimate(key: Any): (Long, Long, Long) = {
    val (c, e) = s.estimateCount(key); (c - e, c, c)
  }
  /** Space-Saving has no width to fold; halve the capacity keeping the
   * largest counters — retained keys keep valid bounds, tail keys are
   * forgotten (acceptable for aged intervals; the ĉ fold proper is a CMS
   * concept). */
  def compressed: IntervalSketch = {
    val half = new StreamSummary(math.max(1, s.capacity / 2))
    // StreamSummary.topK yields (key, count, ERROR) — carry the error
    // through unchanged so trueCount ∈ [count − error, count] still holds
    s.topK(math.max(1, s.capacity / 2)).foreach { case (k, c, e) =>
      half.put(k, c, e)
    }
    SummaryInterval(half)
  }
  def compressible(minWidth: Int): Boolean = s.capacity / 2 >= minWidth
  def entryCount: Long = s.counters.size.toLong
}

/**
 * Hokusai-style time-bucketed retention (reference `execution/Hokusai.scala`).
 * Two aging policies from the paper:
 *
 *  - **Time aggregation** (default — reference `TimeAggregation:394`): the
 *    most recent `maxInterval` intervals are kept at full resolution; older
 *    intervals are folded into dyadic (power-of-two-sized) coarse buckets,
 *    so memory stays O(maxInterval + log T) while old ranges remain
 *    queryable at reduced TIME resolution.
 *  - **Item aggregation** (`itemAggregation = true` — reference
 *    `ItemAggregation:317`, `TimeAndItemAggregation:436`): every interval
 *    is kept individually, but a sketch of age `a` has had its width halved
 *    `floor(log2 a)` times (the paper's shrinking-width ĉ, down to
 *    `minWidth`) — memory per interval decays geometrically with age while
 *    queries keep full per-interval TIME granularity at reduced precision.
 *    ε doubles per fold; the CMS overestimate-only guarantee survives every
 *    fold, and the widened bounds are reported automatically because
 *    `Approximate` slack is computed from the folded width.
 */
final class TimeBucketedSketch(
    val maxInterval: Int,
    val mk: () => IntervalSketch,
    val itemAggregation: Boolean = false,
    val minWidth: Int = 64) extends Serializable {

  // full-resolution recent intervals
  val intervals: mutable.SortedMap[Long, IntervalSketch] = mutable.SortedMap.empty
  // dyadic history: (startInterval, length) -> merged sketch (time mode)
  val history: mutable.SortedMap[(Long, Long), IntervalSketch] = mutable.SortedMap.empty
  // item mode: folds applied per interval
  private val folds: mutable.Map[Long, Int] = mutable.Map.empty

  /** Actual counters/cells currently held across every retained bucket. */
  def entryCount: Long =
    intervals.valuesIterator.map(_.entryCount).sum +
      history.valuesIterator.map(_.entryCount).sum

  /** Remove a full-resolution interval bucket (spill path). Clears the
   * interval's fold count too: a late-arriving re-materialized bucket at
   * the same interval starts full-width and must not skip its expected
   * compression steps because of a stale entry. */
  def removeInterval(iv: Long): Option[IntervalSketch] = {
    val removed = intervals.remove(iv)
    if (removed.isDefined) folds.remove(iv)
    removed
  }

  /** Remove a dyadic history block (spill path). */
  def removeHistory(span: (Long, Long)): Option[IntervalSketch] =
    history.remove(span)

  def addTo(interval: Long, sketch: IntervalSketch): Unit = {
    intervals.get(interval) match {
      // mergeWith aligns widths, so fresh full-width data folds into an
      // already-compressed aged interval correctly
      case Some(existing) => intervals.update(interval, existing.mergeWith(sketch))
      case None => intervals.update(interval, sketch)
    }
    compact()
  }

  private def compact(): Unit =
    if (itemAggregation) compactItems() else compactTime()

  private def compactItems(): Unit = {
    if (intervals.isEmpty) return
    val newest = intervals.lastKey
    val updates = intervals.toSeq.flatMap { case (iv, sk) =>
      val age = newest - iv
      if (age < 2) None
      else {
        val target = 63 - java.lang.Long.numberOfLeadingZeros(age) // floor log2
        var cur = folds.getOrElse(iv, 0)
        var s = sk
        var changed = false
        while (cur < target && s.compressible(minWidth)) {
          s = s.compressed; cur += 1; changed = true
        }
        if (changed) Some((iv, s, cur)) else None
      }
    }
    updates.foreach { case (iv, s, cur) =>
      intervals.update(iv, s)
      folds.update(iv, cur)
    }
  }

  private def compactTime(): Unit = {
    while (intervals.size > maxInterval) {
      val (oldest, sk) = intervals.head
      intervals.remove(oldest)
      var entry: ((Long, Long), IntervalSketch) = ((oldest, 1L), sk)
      // dyadic carry: merge equal-length adjacent history blocks
      var done = false
      while (!done) {
        val ((start, len), s) = entry
        history.find { case ((hs, hl), _) => hl == len && hs + hl == start } match {
          case Some(((hs, hl), hsk)) =>
            history.remove((hs, hl))
            entry = ((hs, len * 2), hsk.mergeWith(s))
          case None => done = true
        }
      }
      history.update(entry._1, entry._2)
    }
  }

  /** Sketches overlapping [startInterval, endInterval] (inclusive). Coarse
   * history blocks are included when they overlap the range — the Hokusai
   * resolution trade-off for old data. */
  def range(startInterval: Long, endInterval: Long): Seq[IntervalSketch] = {
    val until = if (endInterval == Long.MaxValue) endInterval else endInterval + 1
    val recent = intervals.range(startInterval, until).values.toSeq
    val old = history.collect {
      case ((hs, hl), s) if hs <= endInterval && (hs + hl - 1) >= startInterval => s
    }.toSeq
    recent ++ old
  }

  /** Merged sketches over the range. Always folds into a FRESH sketch —
   * `mergeWith` mutates its receiver, and the single-element case of a
   * plain reduce would hand the caller the stored bucket itself, which a
   * subsequent merge (e.g. with spilled buckets) would then corrupt. */
  def mergedRange(startInterval: Long, endInterval: Long): Option[IntervalSketch] = {
    val rs = range(startInterval, endInterval)
    if (rs.isEmpty) None else Some(rs.foldLeft(mk())(_.mergeWith(_)))
  }

  /** Actual [min, max] interval span (inclusive) of the buckets overlapping
   * [startInterval, endInterval] — coarse history blocks contribute their
   * full extent (the Hokusai resolution trade-off for old data). */
  def coveredRange(startInterval: Long, endInterval: Long): Option[(Long, Long)] = {
    val until = if (endInterval == Long.MaxValue) endInterval else endInterval + 1
    val rec = intervals.range(startInterval, until).keys.toSeq
    val old = history.keys.toSeq.filter { case (hs, hl) =>
      hs <= endInterval && hs + hl - 1 >= startInterval
    }
    val mins = rec ++ old.map(_._1)
    val maxs = rec ++ old.map { case (hs, hl) => hs + hl - 1 }
    if (mins.isEmpty) None else Some((mins.min, maxs.max))
  }

  /** Replace this sketch's entire bucket state from a snapshot (the
   * re-attach path of a persisted TopK table). Config fields are taken
   * from this instance; the snapshot's buckets overwrite in place. */
  def restoreFrom(bytes: Array[Byte]): Unit = {
    val t = TimeBucketedSketch.fromSnapshot(bytes)
    intervals.clear(); history.clear(); folds.clear()
    intervals ++= t.intervals
    history ++= t.history
    folds ++= t.folds
  }

  /** Full-state byte snapshot (config + an empty prototype from `mk` +
   * every bucket), the unit Kryo/checkpoint serialization delegates to —
   * `mk` itself is an arbitrary closure and never crosses the wire. */
  def snapshotBytes: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    def writeBlob(b: Array[Byte]): Unit = { out.writeInt(b.length); out.write(b) }
    out.writeInt(maxInterval)
    out.writeBoolean(itemAggregation)
    out.writeInt(minWidth)
    writeBlob(IntervalSketch.toBytes(mk()))
    out.writeInt(intervals.size)
    intervals.foreach { case (iv, s) =>
      out.writeLong(iv); writeBlob(IntervalSketch.toBytes(s))
    }
    out.writeInt(history.size)
    history.foreach { case ((hs, hl), s) =>
      out.writeLong(hs); out.writeLong(hl); writeBlob(IntervalSketch.toBytes(s))
    }
    out.writeInt(folds.size)
    folds.foreach { case (iv, f) => out.writeLong(iv); out.writeInt(f) }
    out.flush()
    bos.toByteArray
  }
}

object TimeBucketedSketch {
  def fromSnapshot(bytes: Array[Byte]): TimeBucketedSketch = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    def readBlob(): Array[Byte] = {
      val b = new Array[Byte](in.readInt()); in.readFully(b); b
    }
    val maxInterval = in.readInt()
    val itemAggregation = in.readBoolean()
    val minWidth = in.readInt()
    val proto = readBlob()
    val t = new TimeBucketedSketch(maxInterval,
      () => IntervalSketch.fromBytes(proto), itemAggregation, minWidth)
    (0 until in.readInt()).foreach { _ =>
      val iv = in.readLong(); t.intervals.update(iv, IntervalSketch.fromBytes(readBlob()))
    }
    (0 until in.readInt()).foreach { _ =>
      val hs = in.readLong(); val hl = in.readLong()
      t.history.update((hs, hl), IntervalSketch.fromBytes(readBlob()))
    }
    (0 until in.readInt()).foreach { _ =>
      val iv = in.readLong(); t.folds.update(iv, in.readInt())
    }
    t
  }
}
