package graft.sketch

import scala.collection.mutable

/** A sketch of either family, per time interval. */
sealed trait IntervalSketch extends Serializable {
  def mergeWith(o: IntervalSketch): IntervalSketch
  def topK(n: Int): Seq[(Any, Long, Long)]
  def estimate(key: Any): (Long, Long, Long) // (lower, estimate, upper)
}

final case class CmsInterval(s: TopKCms) extends IntervalSketch {
  def mergeWith(o: IntervalSketch): IntervalSketch =
    CmsInterval(s.merge(o.asInstanceOf[CmsInterval].s))
  def topK(n: Int): Seq[(Any, Long, Long)] = s.topK(n)
  def estimate(key: Any): (Long, Long, Long) = {
    val a = s.estimate(key); (a.lowerBound, a.estimate, a.max)
  }
}

final case class SummaryInterval(s: StreamSummary) extends IntervalSketch {
  def mergeWith(o: IntervalSketch): IntervalSketch =
    SummaryInterval(s.merge(o.asInstanceOf[SummaryInterval].s))
  def topK(n: Int): Seq[(Any, Long, Long)] =
    s.topK(n).map { case (k, c, e) => (k, c, c - e) } // lower bound = c − e
  def estimate(key: Any): (Long, Long, Long) = {
    val (c, e) = s.estimateCount(key); (c - e, c, c)
  }
}

/**
 * Hokusai-style time-bucketed retention (reference `execution/Hokusai.scala`
 * — `TimeAggregation:394`): the most recent `maxInterval` intervals are kept
 * at full resolution; older intervals are folded into dyadic
 * (power-of-two-sized) coarse buckets, so memory stays
 * O(maxInterval + log T) while old ranges remain queryable at reduced
 * resolution — the paper's time-aggregation trade-off.
 */
final class TimeBucketedSketch(
    val maxInterval: Int,
    val mk: () => IntervalSketch) extends Serializable {

  // full-resolution recent intervals
  val intervals: mutable.SortedMap[Long, IntervalSketch] = mutable.SortedMap.empty
  // dyadic history: (startInterval, length) -> merged sketch
  val history: mutable.SortedMap[(Long, Long), IntervalSketch] = mutable.SortedMap.empty

  def addTo(interval: Long, sketch: IntervalSketch): Unit = {
    intervals.get(interval) match {
      case Some(existing) => intervals.update(interval, existing.mergeWith(sketch))
      case None => intervals.update(interval, sketch)
    }
    compact()
  }

  private def compact(): Unit = {
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

  def mergedRange(startInterval: Long, endInterval: Long): Option[IntervalSketch] =
    range(startInterval, endInterval).reduceOption((a, b) => mk().mergeWith(a).mergeWith(b))

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
}
