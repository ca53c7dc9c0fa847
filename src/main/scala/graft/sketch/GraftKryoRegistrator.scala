package graft.sketch

import com.esotericsoftware.kryo.{Kryo, Serializer}
import com.esotericsoftware.kryo.io.{Input, Output}

/**
 * Kryo registration for the sketch family (reference registers its sketches
 * the same way — `execution/serializer/serializers.scala`,
 * `SnappyKryoRegistrator.scala`): each class serializes through its compact
 * byte form rather than Kryo field reflection, so the wire format is
 * identical to the `SketchAggregate` shuffle format and stable across JVMs.
 *
 * Enable with:
 * {{{
 *   spark.serializer          org.apache.spark.serializer.KryoSerializer
 *   spark.kryo.registrator    graft.sketch.GraftKryoRegistrator
 * }}}
 */
class GraftKryoRegistrator extends org.apache.spark.serializer.KryoRegistrator {

  private def viaBytes[T](enc: T => Array[Byte], dec: Array[Byte] => T): Serializer[T] =
    new Serializer[T] {
      override def write(kryo: Kryo, out: Output, t: T): Unit = {
        val b = enc(t)
        out.writeInt(b.length)
        out.writeBytes(b)
      }
      override def read(kryo: Kryo, in: Input, cls: Class[T]): T =
        dec(in.readBytes(in.readInt()))
    }

  override def registerClasses(kryo: Kryo): Unit = {
    kryo.register(classOf[CountMinSketch],
      viaBytes[CountMinSketch](_.serialized, CountMinSketch.deserialize))
    kryo.register(classOf[TopKCms],
      viaBytes[TopKCms](_.serialized, TopKCms.deserialize))
    kryo.register(classOf[StreamSummary],
      viaBytes[StreamSummary](_.serialized, StreamSummary.deserialize))
    kryo.register(classOf[CmsInterval],
      viaBytes[CmsInterval](IntervalSketch.toBytes,
        b => IntervalSketch.fromBytes(b).asInstanceOf[CmsInterval]))
    kryo.register(classOf[SummaryInterval],
      viaBytes[SummaryInterval](IntervalSketch.toBytes,
        b => IntervalSketch.fromBytes(b).asInstanceOf[SummaryInterval]))
    kryo.register(classOf[TimeBucketedSketch],
      viaBytes[TimeBucketedSketch](_.snapshotBytes, TimeBucketedSketch.fromSnapshot))
  }
}
