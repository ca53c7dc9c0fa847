package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Bounded n-extreme buffer over (ord, tiebreak) PAIRS, compared
 * lexicographically: primary `ord` ascending (default) or descending
 * (`smallest = false` — a dedicated flag, NOT value negation, which would
 * corrupt `Long.MinValue`); secondary `tb` always ascending, so ties on
 * `ord` resolve deterministically instead of all surviving. A binary heap
 * whose root is the worst retained pair — a better pair evicts it in
 * O(log n). Pairs are stored interleaved (heap(2i) = ord, heap(2i+1) = tb)
 * to keep the partial buffer a single flat long array.
 */
final class MinNBuffer(val n: Int, val smallest: Boolean = true)
    extends Serializable {
  val heap = new Array[Long](2 * n)
  var size = 0

  // true when pair a (by index) should sit ABOVE pair b in the heap
  // (closer to the root = first to evict). For `smallest` the heap keeps
  // the n least pairs, so the root is the GREATEST retained pair; for
  // largest the primary comparison flips. The tiebreak comparison does
  // not flip: among equal `ord`, the larger tb is always the worse pair.
  @inline private def outranksIdx(a: Int, b: Int): Boolean = {
    val ao = heap(2 * a); val bo = heap(2 * b)
    if (ao != bo) { if (smallest) ao > bo else ao < bo }
    else heap(2 * a + 1) > heap(2 * b + 1)
  }

  // same ordering, value form: true when (o, t) is strictly BETTER (more
  // retainable) than the pair at idx
  @inline private def betterThanIdx(o: Long, t: Long, idx: Int): Boolean = {
    val io = heap(2 * idx)
    if (o != io) { if (smallest) o < io else o > io }
    else t < heap(2 * idx + 1)
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    var tmp = heap(2 * a); heap(2 * a) = heap(2 * b); heap(2 * b) = tmp
    tmp = heap(2 * a + 1); heap(2 * a + 1) = heap(2 * b + 1); heap(2 * b + 1) = tmp
  }

  def offer(o: Long, t: Long): Unit = {
    if (size < n) {
      heap(2 * size) = o; heap(2 * size + 1) = t
      size += 1
      // sift up
      var i = size - 1
      while (i > 0 && outranksIdx(i, (i - 1) / 2)) {
        swap(i, (i - 1) / 2)
        i = (i - 1) / 2
      }
    } else if (n > 0 && betterThanIdx(o, t, 0)) {
      // strictly better than the root (the current worst retained pair):
      // replace it and restore the heap property
      heap(0) = o; heap(1) = t
      // sift down
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var m = i
        if (l < size && outranksIdx(l, m)) m = l
        if (r < size && outranksIdx(r, m)) m = r
        if (m == i) done = true
        else { swap(m, i); i = m }
      }
    }
  }

  def mergeFrom(other: MinNBuffer): Unit = {
    var i = 0
    while (i < other.size) { offer(other.heap(2 * i), other.heap(2 * i + 1)); i += 1 }
  }

  /** retained pairs sorted ascending by (ord, tb) — a deterministic output
    * ordering independent of heap layout */
  def sortedPairs: Array[(Long, Long)] = {
    val out = new Array[(Long, Long)](size)
    var i = 0
    while (i < size) { out(i) = (heap(2 * i), heap(2 * i + 1)); i += 1 }
    java.util.Arrays.sort(out, (a: (Long, Long), b: (Long, Long)) => {
      val c = java.lang.Long.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    })
    out
  }
}

/**
 * `bounded_min_n(ord, tb, n)` — the n lexicographically-least (or, with
 * `smallest = false`, greatest-by-`ord`) `(ord, tb)` pairs per group, as a
 * sorted `array<struct<o:bigint, t:bigint>>`. `tb` is a deterministic
 * tiebreak (a content hash): equal `ord` values rank by it, so a cap over
 * a ties-heavy ordering (quality scores with mass point values) still
 * retains exactly n pairs.
 *
 * The scale property is the BOUND: each map task's partial buffer holds at
 * most 2n longs per group, so hot keys (one web domain with billions of
 * documents) shuffle n pairs instead of their full membership — unlike
 * `collect_list`+`slice` (unbounded partials, OOM on skew) or a
 * `row_number()` window (full shuffle AND per-key sort of every payload
 * row). [[graft.pipeline.Pipeline.capPerKey]] builds per-key quota capping
 * on top; no counterpart in the reference (its sampling operators bound by
 * FRACTION, not by per-stratum rank).
 */
case class BoundedMinN(
    ord: Expression,
    tb: Expression,
    n: Int,
    smallest: Boolean = true,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinNBuffer] {

  require(n > 0, s"bounded_min_n needs a positive bound, got $n")

  override def children: Seq[Expression] = ord :: tb :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("o", LongType, nullable = false),
      StructField("t", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): MinNBuffer = new MinNBuffer(n, smallest)

  override def update(buffer: MinNBuffer, input: InternalRow): MinNBuffer = {
    val o = ord.eval(input)
    if (o != null) {
      val t = tb.eval(input)
      // a NULL tiebreak still ranks (as 0) — the tiebreak only needs to be
      // deterministic, not total; NULL ord rows are unrankable and skipped
      val tv = if (t == null) 0L else t.asInstanceOf[Number].longValue()
      buffer.offer(o.asInstanceOf[Number].longValue(), tv)
    }
    buffer
  }

  override def merge(buffer: MinNBuffer, other: MinNBuffer): MinNBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: MinNBuffer): Any = {
    val pairs = buffer.sortedPairs
    val rows = new Array[Any](pairs.length)
    var i = 0
    while (i < pairs.length) {
      rows(i) = new GenericInternalRow(Array[Any](pairs(i)._1, pairs(i)._2))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: MinNBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * buffer.size)
    bb.putInt(buffer.n).putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putLong(buffer.heap(2 * i)).putLong(buffer.heap(2 * i + 1)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MinNBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val bufN = bb.getInt
    val size = bb.getInt
    val out = new MinNBuffer(bufN, smallest)
    var i = 0
    // stored pairs are already the n extremes of their partial — replay
    // through offer to restore the heap property
    while (i < size) { val o = bb.getLong; val t = bb.getLong; out.offer(o, t); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedMinN =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedMinN =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedMinN =
    copy(ord = newChildren(0), tb = newChildren(1))

  override def prettyName: String =
    if (smallest) "bounded_min_n" else "bounded_max_n"
}
