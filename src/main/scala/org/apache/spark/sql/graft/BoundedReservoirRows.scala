package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * One-pass bounded reservoir buffer: the `n` rows with the smallest `ord`
 * values seen so far, plus the TOTAL row count of the group. A binary
 * max-heap on `ord` whose root is the worst retained row; a strictly
 * smaller `ord` evicts it in O(log n). Ties on `ord` keep the incumbent —
 * with a content-hash `ord`, tied rows are identical (or a 2⁻⁶⁴
 * collision), so the retained MULTISET matches the `row_number() over
 * (order by ord)` selection the two-pass sampler plan computes.
 *
 * Payloads are serialized `UnsafeRow` bytes, so a partial buffer holds at
 * most `n` rows per group per map task regardless of group skew — the
 * same bound class as [[BoundedMinN]], carrying rows instead of pairs.
 */
final class ReservoirRowsBuffer(val n: Int) extends Serializable {
  var total: Long = 0L
  val ords = new Array[Long](n)
  val rows = new Array[Array[Byte]](n)
  var size = 0

  @inline private def swap(a: Int, b: Int): Unit = {
    val to = ords(a); ords(a) = ords(b); ords(b) = to
    val tr = rows(a); rows(a) = rows(b); rows(b) = tr
  }

  /** Offer WITHOUT counting (merge path re-offers already-counted rows). */
  def offerRetained(o: Long, bytes: Array[Byte]): Unit = {
    if (size < n) {
      ords(size) = o; rows(size) = bytes
      size += 1
      var i = size - 1
      while (i > 0 && ords(i) > ords((i - 1) / 2)) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (n > 0 && o < ords(0)) {
      ords(0) = o; rows(0) = bytes
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < size && ords(l) > ords(m)) m = l
        if (r < size && ords(r) > ords(m)) m = r
        if (m == i) done = true else { swap(m, i); i = m }
      }
    }
  }

  def mergeFrom(other: ReservoirRowsBuffer): Unit = {
    total += other.total
    var i = 0
    while (i < other.size) { offerRetained(other.ords(i), other.rows(i)); i += 1 }
  }
}

/**
 * `bounded_reservoir_rows(ord, row, n)` — per group: the group's total row
 * count AND the `n` rows with the smallest `ord`, returned as
 * `struct<total: bigint, rows: array<struct rowType>>` (rows sorted
 * ascending by `ord` for a deterministic output order).
 *
 * This is the ONE-PASS form of the stratified sampler's pure-reservoir
 * mode (`fraction == 0`): the classic plan needs a per-stratum totals scan
 * PLUS a full-width scan feeding a prefilter + rank window, while this
 * aggregate computes both the total and the exact same smallest-`n`-by-
 * content-hash selection in a single map-side-combined pass whose shuffle
 * is ≤ `n` rows per stratum per map task. NULL `ord` rows count toward the
 * total but are never retained (the two-pass plan never produces a NULL
 * rank hash — `xxhash64` is total — so the selections agree).
 */
case class BoundedReservoirRows(
    ord: Expression,
    row: Expression,
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ReservoirRowsBuffer] {

  require(n > 0, s"bounded_reservoir_rows needs a positive bound, got $n")

  // lazy: `row` is unresolved at construction time in the DataFrame API
  private lazy val rowType = row.dataType.asInstanceOf[StructType]

  override def children: Seq[Expression] = ord :: row :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("rows", ArrayType(rowType, containsNull = false),
      nullable = false)))

  override def createAggregationBuffer(): ReservoirRowsBuffer =
    new ReservoirRowsBuffer(n)

  // one projection per task thread; UnsafeProjection is not thread-safe
  @transient private lazy val toUnsafe = UnsafeProjection.create(rowType)

  override def update(buffer: ReservoirRowsBuffer,
      input: InternalRow): ReservoirRowsBuffer = {
    buffer.total += 1
    val o = ord.eval(input)
    if (o != null) {
      val ov = o.asInstanceOf[Number].longValue()
      // only serialize when the row can actually be retained
      if (buffer.size < n || ov < buffer.ords(0)) {
        val r = row.eval(input).asInstanceOf[InternalRow]
        val bytes = toUnsafe(r).getBytes.clone()
        buffer.offerRetained(ov, bytes)
      }
    }
    buffer
  }

  override def merge(buffer: ReservoirRowsBuffer,
      other: ReservoirRowsBuffer): ReservoirRowsBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: ReservoirRowsBuffer): Any = {
    // sorted ascending by ord: deterministic output order
    val idx = (0 until buffer.size).sortBy(i => buffer.ords(i))
    val arr = new Array[Any](buffer.size)
    var i = 0
    while (i < buffer.size) {
      val bytes = buffer.rows(idx(i))
      val ur = new UnsafeRow(rowType.length)
      ur.pointTo(bytes, bytes.length)
      arr(i) = ur
      i += 1
    }
    new GenericInternalRow(Array[Any](buffer.total, new GenericArrayData(arr)))
  }

  override def serialize(buffer: ReservoirRowsBuffer): Array[Byte] = {
    var bytes = 4 + 4 + 8
    var i = 0
    while (i < buffer.size) { bytes += 8 + 4 + buffer.rows(i).length; i += 1 }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buffer.n).putInt(buffer.size).putLong(buffer.total)
    i = 0
    while (i < buffer.size) {
      bb.putLong(buffer.ords(i)).putInt(buffer.rows(i).length)
      bb.put(buffer.rows(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ReservoirRowsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val bufN = bb.getInt
    val size = bb.getInt
    val out = new ReservoirRowsBuffer(bufN)
    out.total = bb.getLong
    var i = 0
    while (i < size) {
      val o = bb.getLong
      val len = bb.getInt
      val payload = new Array[Byte](len)
      bb.get(payload)
      out.offerRetained(o, payload)
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedReservoirRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedReservoirRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedReservoirRows =
    copy(ord = newChildren(0), row = newChildren(1))

  override def prettyName: String = "bounded_reservoir_rows"
}
