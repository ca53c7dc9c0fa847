package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal (image/audio/video) columns for training-data pipelines: media
 * travel as opaque `binary` columns with typed metadata structs; decode /
 * feature-extraction runs batched inside `mapPartitions`.
 *
 * The actual codec calls are STUBBED (this container ships no image/audio
 * libraries): [[StubDecoder]] derives deterministic fake properties from the
 * bytes. The Spark-side plumbing — schema, batch iteration shape,
 * partitioning, output struct — is real and is what a production decoder
 * would drop into (swap [[Decoder.decode]] with e.g. a JNI image library).
 */
object Multimodal {

  /** Typed metadata produced by decode. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("format", StringType),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("content_hash", LongType, nullable = false)))

  /** One decoded batch element. */
  final case class MediaMeta(nBytes: Long, format: String, width: Int,
      height: Int, nFrames: Int, contentHash: Long)

  trait Decoder extends Serializable {
    /** Decode one blob. Production implementations plug in here. */
    def decode(bytes: Array[Byte]): MediaMeta
  }

  /**
   * STUB decoder — deterministic fake: dimensions and frame count derived
   * from byte length and a content hash, format sniffed from magic bytes.
   * Replace with a real codec for production use.
   */
  object StubDecoder extends Decoder {
    override def decode(bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length.toLong
      val format =
        if (bytes.length >= 3 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) "jpeg"
        else if (bytes.length >= 4 && bytes(0) == 0x89.toByte && bytes(1) == 'P') "png"
        else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I') "wav"
        else "bin"
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      MediaMeta(n, format, (n % 640).toInt, (n % 480).toInt, (n % 30).toInt + 1, h)
    }
  }

  /**
   * Batched decode: appends a `media_meta` struct column. Batches of
   * `batchSize` blobs are decoded together inside each partition (the shape
   * a vectorized/NN decoder needs), preserving row order.
   */
  def decodeMeta(df: DataFrame, binCol: String, decoder: Decoder = StubDecoder,
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("media_meta", mediaMetaType, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(outSchema)
    graft.core.Fanout(df).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch-shaped decode: a real implementation would hand the whole
        // Array[Array[Byte]] to the codec at once
        val blobs = batch.map(r =>
          if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx))
        val metas = blobs.map {
          case null => null
          case b =>
            val m = decoder.decode(b)
            Row(m.nBytes, m.format, m.width, m.height, m.nFrames, m.contentHash)
        }
        batch.zip(metas).map { case (r, m) => Row.fromSeq(r.toSeq :+ m) }
      }
    }(enc)
  }

  trait FeatureExtractor extends Serializable {
    def dim: Int
    /** Encode a whole batch at once — the shape a vectorized / neural
     * encoder needs (one forward pass per batch, not per row). */
    def extract(batch: Array[Array[Byte]]): Array[Array[Float]]
  }

  /** STUB extractor — deterministic pseudo-embedding derived from rolling
   * content hashes (unit-normalized). Replace with a real encoder (ONNX /
   * JNI) for production; the batch contract is what such an encoder needs. */
  final class StubExtractor(override val dim: Int) extends FeatureExtractor {
    override def extract(batch: Array[Array[Byte]]): Array[Array[Float]] =
      batch.map { bytes =>
        if (bytes == null) null
        else {
          val v = new Array[Float](dim)
          var h = 1469598103934665603L
          var i = 0
          while (i < bytes.length) { h = (h ^ bytes(i)) * 1099511628211L; i += 1 }
          var d = 0
          var norm = 0.0
          while (d < dim) {
            h = h * 6364136223846793005L + 1442695040888963407L
            v(d) = ((h >>> 40).toInt / 8388608.0f) - 1.0f
            norm += v(d) * v(d)
            d += 1
          }
          val inv = (1.0 / math.sqrt(math.max(norm, 1e-12))).toFloat
          d = 0
          while (d < dim) { v(d) *= inv; d += 1 }
          v
        }
      }
  }

  /**
   * Batched feature extraction: appends a `features array<float>` column
   * (the embedding column the dedup/ANN operators consume). Blobs are
   * encoded `batchSize` at a time inside each partition — the whole
   * `Array[Array[Byte]]` is handed to the extractor in one call, so a
   * real neural encoder amortizes its forward pass across the batch.
   */
  def extractFeatures(df: DataFrame, binCol: String,
      extractor: FeatureExtractor = new StubExtractor(64),
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType), nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(outSchema)
    graft.core.Fanout(df).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val blobs = batch.map(r =>
          if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)).toArray
        val feats = extractor.extract(blobs)
        batch.zip(feats).map { case (r, f) =>
          Row.fromSeq(r.toSeq :+ (if (f == null) null else f.toSeq))
        }
      }
    }(enc)
  }

  /** STUB frame sampler: every `stride`-th frame index of a decoded video —
   * real pipelines replace the index list with actual frame tensors. */
  def sampleFrameIndices(df: DataFrame, metaCol: String, stride: Int): DataFrame =
    df.withColumn("frame_indices",
      sequence(lit(0), greatest(col(s"$metaCol.n_frames") - 1, lit(0)), lit(stride)))

  /** STUB resize: recomputes target dimensions preserving aspect ratio —
   * a real implementation would transform pixel buffers. */
  def resizeMeta(df: DataFrame, metaCol: String, targetWidth: Int): DataFrame =
    df.withColumn("resized",
      struct(
        lit(targetWidth).as("width"),
        when(col(s"$metaCol.width") > 0,
          (col(s"$metaCol.height") * targetWidth / col(s"$metaCol.width")).cast("int"))
          .otherwise(lit(0)).as("height")))
}
