package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Bounded n-extreme buffer: a binary heap over the n smallest (default) or
 * n largest values offered so far. For `smallest` it is a MAX-heap — the
 * root is the largest retained value, so a new smaller value evicts it in
 * O(log n); for largest the comparisons flip (a dedicated flag, NOT value
 * negation, which would corrupt `Long.MinValue`).
 */
final class MinNBuffer(val n: Int, val smallest: Boolean = true)
    extends Serializable {
  val heap = new Array[Long](n)
  var size = 0

  // true when `a` should sit ABOVE `b` in the heap (closer to the root =
  // first to evict)
  @inline private def outranks(a: Long, b: Long): Boolean =
    if (smallest) a > b else a < b

  def offer(v: Long): Unit = {
    if (size < n) {
      heap(size) = v
      size += 1
      // sift up
      var i = size - 1
      while (i > 0 && outranks(heap(i), heap((i - 1) / 2))) {
        val p = (i - 1) / 2
        val t = heap(p); heap(p) = heap(i); heap(i) = t
        i = p
      }
    } else if (n > 0 && outranks(heap(0), v)) {
      heap(0) = v
      // sift down
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var m = i
        if (l < size && outranks(heap(l), heap(m))) m = l
        if (r < size && outranks(heap(r), heap(m))) m = r
        if (m == i) done = true
        else {
          val t = heap(m); heap(m) = heap(i); heap(i) = t
          i = m
        }
      }
    }
  }

  def mergeFrom(other: MinNBuffer): Unit = {
    var i = 0
    while (i < other.size) { offer(other.heap(i)); i += 1 }
  }

  def sortedValues: Array[Long] = {
    val out = java.util.Arrays.copyOf(heap, size)
    java.util.Arrays.sort(out)
    out
  }
}

/**
 * `bounded_min_n(ord, n)` — the n smallest (or, with `smallest = false`,
 * largest) `ord` values per group, as a sorted `array<bigint>`.
 *
 * The scale property is the BOUND: each map task's partial buffer holds at
 * most n longs per group, so hot keys (one web domain with billions of
 * documents) shuffle n values instead of their full membership — unlike
 * `collect_list`+`slice` (unbounded partials, OOM on skew) or a
 * `row_number()` window (full shuffle AND per-key sort of every payload
 * row). [[graft.pipeline.Pipeline.capPerKey]] builds per-key quota capping
 * on top; no counterpart in the reference (its sampling operators bound by
 * FRACTION, not by per-stratum rank).
 */
case class BoundedMinN(
    ord: Expression,
    n: Int,
    smallest: Boolean = true,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinNBuffer] {

  require(n > 0, s"bounded_min_n needs a positive bound, got $n")

  override def children: Seq[Expression] = ord :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): MinNBuffer = new MinNBuffer(n, smallest)

  override def update(buffer: MinNBuffer, input: InternalRow): MinNBuffer = {
    val v = ord.eval(input)
    if (v != null) buffer.offer(v.asInstanceOf[Number].longValue())
    buffer
  }

  override def merge(buffer: MinNBuffer, other: MinNBuffer): MinNBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: MinNBuffer): Any =
    new GenericArrayData(buffer.sortedValues)

  override def serialize(buffer: MinNBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * buffer.size)
    bb.putInt(buffer.n).putInt(buffer.size)
    var i = 0
    while (i < buffer.size) { bb.putLong(buffer.heap(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MinNBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val bufN = bb.getInt
    val size = bb.getInt
    val out = new MinNBuffer(bufN, smallest)
    var i = 0
    // stored values are already the n extremes of their partial — replay
    // through offer to restore the heap property
    while (i < size) { out.offer(bb.getLong); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedMinN =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedMinN =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedMinN =
    copy(ord = newChildren(0))

  override def prettyName: String =
    if (smallest) "bounded_min_n" else "bounded_max_n"
}
