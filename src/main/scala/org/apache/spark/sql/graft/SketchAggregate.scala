package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sketch._

/**
 * Distributed sketch construction as a `TypedImperativeAggregate`: each
 * partition builds a partial sketch (map-side combine — the only data that
 * shuffles is the fixed-size sketch itself), merged to one sketch per group
 * and returned serialized (`BinaryType`).
 *
 * Replaces the reference's per-partition `RDD[(Int, TopK)]` machinery
 * (`approximate/TopKUtil.scala:58-60`, `SnappyContextAQPFunctions.scala:247-356`)
 * with Spark's native partial-aggregation path — the idiomatic equivalent of
 * its "per-partition sketch → reduce" pipeline, with no custom scheduling.
 */
case class SketchAggregate(
    key: Expression,
    freq: Expression,
    variant: String, // "cms" | "summary"
    k: Int,
    depth: Int,
    width: Int,
    capacity: Int,
    seed: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[IntervalSketch] {

  override def children: Seq[Expression] = key :: freq :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): IntervalSketch =
    if (variant == "summary") SummaryInterval(new StreamSummary(capacity))
    else CmsInterval(new TopKCms(k, depth, width, seed))

  private def keyValue(input: InternalRow): Any = {
    val v = key.eval(input)
    v match {
      case null => null
      case s: UTF8String => s.toString
      case l: Long => l
      case i: Int => i.toLong
      case o => o.toString
    }
  }

  override def update(buffer: IntervalSketch, input: InternalRow): IntervalSketch = {
    val kv = keyValue(input)
    if (kv != null) {
      val f = freq.eval(input)
      val n = if (f == null) 1L else f.asInstanceOf[Number].longValue()
      buffer match {
        case CmsInterval(s) => s.add(kv, n)
        case SummaryInterval(s) => s.add(kv, n)
      }
    }
    buffer
  }

  override def merge(buffer: IntervalSketch, other: IntervalSketch): IntervalSketch =
    buffer.mergeWith(other)

  override def eval(buffer: IntervalSketch): Any = serialize(buffer)

  override def serialize(buffer: IntervalSketch): Array[Byte] =
    IntervalSketch.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): IntervalSketch =
    SketchAggregate.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): SketchAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SketchAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SketchAggregate =
    copy(key = newChildren(0), freq = newChildren(1))

  override def prettyName: String = s"${variant}_sketch"
}

object SketchAggregate {
  def fromBytes(bytes: Array[Byte]): IntervalSketch = IntervalSketch.fromBytes(bytes)

  def apply(keyCol: Column, freqCol: Column, variant: String, k: Int,
      depth: Int, width: Int, capacity: Int, seed: Int): Column =
    Exprs.column(new SketchAggregate(
      Exprs.expression(keyCol), Exprs.expression(freqCol), variant, k, depth,
      width, capacity, seed).toAggregateExpression())
}

/**
 * `sketch_topk(bytes, k)`: decode a serialized [[SketchAggregate]] buffer
 * into its top-k entries as `array<struct<key, estimated_value,
 * lower_bound>>`. Runs on executors, so a windowed streaming sketch
 * aggregation can emit final top-k rows without any driver-held state —
 * `groupBy(window(...)).agg(sketch).select(explode(sketch_topk(...)))`.
 */
case class SketchTopK(child: Expression, k: Int, keyIsString: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", if (keyIsString) StringType else LongType),
    StructField("estimated_value", LongType),
    StructField("lower_bound", LongType))), containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val sketch = SketchAggregate.fromBytes(v.asInstanceOf[Array[Byte]])
    val rows = sketch.topK(k).map { case (key, est, lower) =>
      val keyVal: Any =
        if (keyIsString) UTF8String.fromString(String.valueOf(key))
        else key.asInstanceOf[Number].longValue()
      InternalRow(keyVal, est, lower)
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): SketchTopK =
    copy(child = newChild)
}

object SketchTopK {
  def apply(c: Column, k: Int, keyIsString: Boolean): Column =
    Exprs.column(new SketchTopK(Exprs.expression(c), k, keyIsString))
}
