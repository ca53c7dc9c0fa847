package graft.sketch

import java.nio.ByteBuffer

import scala.util.hashing.MurmurHash3

/** CMS point estimate with bounds (reference `execution/Approximate.scala:25-55`):
 * CMS guarantees `true ≤ estimate ≤ true + ε·N` with probability ≥ 1−δ. */
final case class Approximate(
    lowerBound: Long, estimate: Long, max: Long, probabilityWithinBounds: Double) {
  def +(o: Approximate): Approximate = Approximate(
    lowerBound + o.lowerBound, estimate + o.estimate, max + o.max,
    math.min(probabilityWithinBounds, o.probabilityWithinBounds))
}

object Approximate {
  def zero(prob: Double): Approximate = Approximate(0L, 0L, 0L, prob)
}

/**
 * Classic Count-Min sketch, re-implemented from the published algorithm
 * (Cormode & Muthukrishnan) with the reference's sizing rules
 * (`execution/cms/CountMinSketch.scala:65-552`): `W = ⌈e/ε⌉`,
 * `D = ⌈ln(1/δ)⌉`; defaults depth 7 × width 200, ε 0.01, δ-confidence 0.95
 * (`execution/TopKWrapper.scala:71-116`).
 *
 * Keys are hashed per-row with MurmurHash3 (seeded by row index + a global
 * seed), deterministic across JVMs. Supports String and Long keys.
 */
final class CountMinSketch(
    val depth: Int,
    val width: Int,
    val seed: Int,
    val table: Array[Array[Long]],
    var total: Long) extends Serializable {

  def this(depth: Int, width: Int, seed: Int) =
    this(depth, width, seed, Array.fill(depth)(new Array[Long](width)), 0L)

  @inline private def bucket(key: Any, row: Int): Int = {
    val h = key match {
      case s: String => MurmurHash3.stringHash(s, seed + row * 0x9e3779b9)
      case l: Long => MurmurHash3.productHash((l, row), seed)
      case o => MurmurHash3.productHash((o.hashCode.toLong, row), seed)
    }
    val m = h % width
    if (m < 0) m + width else m
  }

  def add(key: Any, count: Long = 1L): Unit = {
    var r = 0
    while (r < depth) { table(r)(bucket(key, r)) += count; r += 1 }
    total += count
  }

  /** Raw cell for `key` in `row` — the Hokusai n̂ refinement works on
   * matching cells across sketches of the same hash family (reference
   * `Hokusai.scala:638-692` `queryBySummingEntityAggregates`/`calcNCarat`).
   * `bucket` is `hash mod width`, so cells correspond across widths related
   * by power-of-two folds. */
  private[sketch] def cell(row: Int, key: Any): Long = table(row)(bucket(key, row))

  def estimateCount(key: Any): Long = {
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = table(r)(bucket(key, r))
      if (v < min) min = v
      r += 1
    }
    if (min == Long.MaxValue) 0L else min
  }

  /** ε = e/width, confidence = 1 − e^−depth. */
  def eps: Double = math.E / width
  def confidence: Double = 1.0 - math.exp(-depth)

  def estimate(key: Any): Approximate = {
    val est = estimateCount(key)
    val slack = math.ceil(eps * total).toLong
    Approximate(math.max(0L, est - slack), est, est, confidence)
  }

  /**
   * Hokusai item-aggregation fold (the paper's ĉ): halve the width by
   * adding the two cells every key can map to — `h mod w` folds into
   * `h mod w/2` because `w/2` divides `w`, so the overestimate-only
   * guarantee is preserved while ε doubles and memory halves (reference
   * `Hokusai.scala:317-333`, `ItemAggregation`/`CountMinSketch.compress`).
   */
  def compressed: CountMinSketch = {
    require(width % 2 == 0, s"compress requires even width, got $width")
    val hw = width / 2
    val nt = Array.fill(depth)(new Array[Long](hw))
    var r = 0
    while (r < depth) {
      var c = 0
      while (c < hw) { nt(r)(c) = table(r)(c) + table(r)(c + hw); c += 1 }
      r += 1
    }
    new CountMinSketch(depth, hw, seed, nt, total)
  }

  /** Fold down to `target` width (must be `width / 2^k` for some k ≥ 0). */
  def compressedTo(target: Int): CountMinSketch = {
    var s = this
    while (s.width > target) s = s.compressed
    require(s.width == target,
      s"width $width not reducible to $target by halving")
    s
  }

  /** Merge; sides of unequal width (same seed/depth family, widths related
   * by powers of two) are aligned by folding the wider one first. Returns
   * `this` mutated when widths already match, else a new sketch. */
  def merge(o: CountMinSketch): CountMinSketch = {
    require(o.depth == depth && o.seed == seed, "incompatible CMS dimensions")
    if (o.width != width) {
      if (width > o.width) return this.compressedTo(o.width).merge(o)
      else return this.merge(o.compressedTo(width))
    }
    var r = 0
    while (r < depth) {
      var c = 0
      while (c < width) { table(r)(c) += o.table(r)(c); c += 1 }
      r += 1
    }
    total += o.total
    this
  }

  def serialized: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * 3 + 8 + depth * width * 8)
    bb.putInt(depth); bb.putInt(width); bb.putInt(seed); bb.putLong(total)
    var r = 0
    while (r < depth) {
      var c = 0
      while (c < width) { bb.putLong(table(r)(c)); c += 1 }
      r += 1
    }
    bb.array()
  }
}

object CountMinSketch {
  /** Sizing per reference `CountMinSketch.scala:33-60`. */
  def withGuarantees(eps: Double, delta: Double, seed: Int = 123): CountMinSketch =
    new CountMinSketch(
      math.ceil(math.log(1.0 / delta)).toInt.max(1),
      math.ceil(math.E / eps).toInt.max(1), seed)

  def deserialize(bytes: Array[Byte]): CountMinSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val depth = bb.getInt; val width = bb.getInt; val seed = bb.getInt
    val total = bb.getLong
    val table = Array.fill(depth)(new Array[Long](width))
    var r = 0
    while (r < depth) {
      var c = 0
      while (c < width) { table(r)(c) = bb.getLong; c += 1 }
      r += 1
    }
    new CountMinSketch(depth, width, seed, table, total)
  }
}
