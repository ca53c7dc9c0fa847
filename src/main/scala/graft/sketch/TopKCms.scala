package graft.sketch

import java.nio.ByteBuffer

import scala.collection.mutable

/**
 * CMS specialised to also track the current top-k candidate keys exactly,
 * like the reference's `TopKCMS` (`execution/cms/TopKCMS.scala:32-220`):
 * frequencies live in the CMS; a bounded candidate set (k × slack) keeps the
 * keys worth reporting, pruned by CMS estimate when it overflows.
 */
final class TopKCms(
    val k: Int,
    val cms: CountMinSketch,
    val candidates: mutable.HashSet[Any]) extends Serializable {

  def this(k: Int, depth: Int, width: Int, seed: Int) =
    this(k, new CountMinSketch(depth, width, seed), mutable.HashSet.empty)

  private def maxCandidates: Int = math.max(k * 4, 64)

  def add(key: Any, count: Long = 1L): Unit = {
    cms.add(key, count)
    candidates += key
    if (candidates.size > maxCandidates) prune()
  }

  private def prune(): Unit = {
    val keep = candidates.toSeq
      .map(c => (c, cms.estimateCount(c)))
      .sortBy { case (key, est) => (-est, keySortable(key)) }
      .take(maxCandidates / 2)
      .map(_._1)
    candidates.clear()
    candidates ++= keep
  }

  def merge(o: TopKCms): TopKCms = {
    val m = cms.merge(o.cms) // may return a width-aligned copy
    // clone the candidate set on the copy path — aliasing it would let the
    // copy's prune() (ranked by the folded, higher-collision CMS) silently
    // drop keys from the receiver
    val out = if (m eq cms) this else new TopKCms(k, m, candidates.clone())
    out.candidates ++= o.candidates
    if (out.candidates.size > maxCandidates) out.prune()
    out
  }

  /** Item-aggregation fold: CMS width halves (ε doubles); the exact
   * candidate set is retained, so old intervals keep reporting their heavy
   * hitters at reduced precision. */
  def compressed: TopKCms = new TopKCms(k, cms.compressed, candidates.clone())

  /** Top-k (key, estimate, lowerBound), ties by key ascending. */
  def topK(n: Int): Seq[(Any, Long, Long)] =
    candidates.toSeq
      .map { c => val a = cms.estimate(c); (c, a.estimate, a.lowerBound) }
      .sortBy { case (key, est, _) => (-est, keySortable(key)) }
      .take(n)

  def estimate(key: Any): Approximate = cms.estimate(key)

  def serialized: Array[Byte] = {
    val cmsBytes = cms.serialized
    val keyBytes = candidates.toSeq.map(StreamSummary.keyToBytes)
    val bb = ByteBuffer.allocate(12 + cmsBytes.length + 4 +
      keyBytes.map(_.length + 4).sum)
    bb.putInt(k); bb.putInt(cmsBytes.length); bb.put(cmsBytes)
    bb.putInt(keyBytes.size)
    keyBytes.foreach { kb => bb.putInt(kb.length); bb.put(kb) }
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }
}

object TopKCms {
  def deserialize(bytes: Array[Byte]): TopKCms = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val cmsLen = bb.getInt
    val cmsBytes = new Array[Byte](cmsLen); bb.get(cmsBytes)
    val cms = CountMinSketch.deserialize(cmsBytes)
    val n = bb.getInt
    val cands = mutable.HashSet.empty[Any]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len); bb.get(kb)
      cands += StreamSummary.keyFromBytes(kb)
      i += 1
    }
    new TopKCms(k, cms, cands)
  }
}
