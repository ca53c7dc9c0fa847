package graft.topk

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SketchAggregate
import org.apache.spark.sql.types._

import graft.sketch.{IntervalSketch, TimeBucketedSketch, CmsInterval, SummaryInterval, TopKCms, StreamSummary}

/**
 * Options of a TopK table, mirroring the reference's `TopKWrapper`
 * (`execution/TopKWrapper.scala:56-155`): `depth`/`width` XOR
 * `eps`/`confidence` (W=⌈e/ε⌉, D=⌈ln(1/δ)⌉), `size` (k, default 100),
 * `timeSeriesColumn` + `timeInterval` (default 5 s when timed),
 * `frequencyCol`, `maxInterval` (default 20), `streamSummary` flag.
 */
final case class TopKOptions(
    key: String,
    timeSeriesColumn: Option[String] = None,
    timeIntervalMs: Long = 5000L,
    size: Int = 100,
    depth: Int = 7,
    width: Int = 200,
    maxInterval: Int = 20,
    streamSummary: Boolean = false,
    frequencyCol: Option[String] = None,
    capacity: Int = 0,
    seed: Int = 123,
    timeUnit: String = "auto",
    itemAggregation: Boolean = false,
    maxDriverEntries: Long = 50000000L) {
  def effectiveCapacity: Int = if (capacity > 0) capacity else math.max(size * 4, 400)

  /** Driver-held entries of one full interval sketch: counters for
   * Space-Saving, cells + candidate heap for CMS. */
  def perIntervalEntries: Long =
    if (streamSummary) effectiveCapacity.toLong else depth.toLong * width + size
}

object TopKOptions {
  /** Parse a `CREATE TOPK TABLE ... OPTIONS(...)` map. */
  def fromOptions(opts: Map[String, String]): TopKOptions = {
    val eps = opts.get("eps").map(_.toDouble)
    val conf = opts.get("confidence").map(_.toDouble)
    val depth = opts.get("depth").map(_.toInt)
      .orElse(conf.map(c => math.ceil(math.log(1.0 / (1.0 - c))).toInt.max(1)))
      .getOrElse(7)
    val width = opts.get("width").map(_.toInt)
      .orElse(eps.map(e => math.ceil(math.E / e).toInt))
      .getOrElse(200)
    TopKOptions(
      key = opts.getOrElse("key",
        throw new IllegalArgumentException("TOPK table requires OPTIONS(key '...')")),
      timeSeriesColumn = opts.get("timeseriescolumn"),
      timeIntervalMs = opts.get("timeinterval").map(_.toLong).getOrElse(5000L),
      size = opts.get("size").map(_.toInt).getOrElse(100),
      depth = depth,
      width = width,
      maxInterval = opts.get("maxinterval").map(_.toInt).getOrElse(20),
      streamSummary = opts.get("streamsummary").exists(_.toBoolean),
      frequencyCol = opts.get("frequencycol"),
      capacity = opts.get("capacity").map(_.toInt).getOrElse(0),
      seed = opts.get("seed").map(_.toInt).getOrElse(123),
      timeUnit = opts.getOrElse("timeunit", "auto"),
      itemAggregation = opts.get("itemaggregation").exists(_.toBoolean),
      maxDriverEntries = opts.get("maxdriverentries").map(_.toLong)
        .getOrElse(50000000L))
  }
}

/**
 * Materialized TopK structure: time-bucketed sketches held on the driver
 * (each interval's sketch is a few KB — the reference likewise collects
 * sketches for querying, `SnappyContextAQPFunctions.scala:288-356`).
 * Populated by batch append (CREATE TOPK TABLE ... ON base) and/or
 * per-micro-batch from streams (SURVEY.md §2.8).
 */
final class TopKState(val name: String, val opts: TopKOptions, val keyType: DataType) {
  // Fail fast when a single interval's sketch alone exceeds the driver
  // bound — that much memory is committed on the very first append.
  require(opts.perIntervalEntries <= opts.maxDriverEntries,
    s"TopK table '$name': one interval sketch holds ${opts.perIntervalEntries} " +
      s"counters, exceeding maxDriverEntries ${opts.maxDriverEntries}. " +
      "Lower capacity/width, raise OPTIONS(maxDriverEntries ...), or use " +
      "graft.streaming.StreamOps.windowedTopK for unbounded cardinality.")

  val variant: String = if (opts.streamSummary) "summary" else "cms"
  val buckets =
    new TimeBucketedSketch(opts.maxInterval, () => mkSketch(), opts.itemAggregation)

  private def mkSketch(): IntervalSketch =
    if (opts.streamSummary) SummaryInterval(new StreamSummary(opts.effectiveCapacity))
    else CmsInterval(new TopKCms(opts.size, opts.depth, opts.width, opts.seed))

  private def intervalOf(tsMillis: Long): Long = tsMillis / opts.timeIntervalMs

  /** Distributed sketch build (one small shuffle of partial sketches), then
   * driver-side merge into the time buckets. */
  def append(df: DataFrame): Unit = {
    // sketches store String or Long keys — normalize integrals to long
    val keyCol =
      if (keyType == StringType) col(opts.key) else col(opts.key).cast(LongType)
    val freqCol = opts.frequencyCol.map(col).getOrElse(lit(1L)).cast(LongType)
    val ivCol = opts.timeSeriesColumn match {
      case Some(ts) =>
        val tsType = df.schema.find(_.name.equalsIgnoreCase(ts)).map(_.dataType)
        val millis = (opts.timeUnit, tsType) match {
          case ("ns", _) => col(ts).cast(LongType) / lit(1000000L)
          case ("ms", _) => col(ts).cast(LongType)
          case ("s", _) => col(ts).cast(LongType) * lit(1000L)
          case (_, Some(TimestampType)) => col(ts).cast("double") * lit(1000.0)
          case _ => col(ts).cast(LongType) // assume epoch millis
        }
        floor(millis / opts.timeIntervalMs.toDouble).cast(LongType)
      case None => lit(0L)
    }
    val agg = SketchAggregate(keyCol, freqCol, variant, opts.size, opts.depth,
      opts.width, opts.effectiveCapacity, opts.seed)
    val rows = df.select(ivCol.as("__iv__"), keyCol, freqCol.as("__freq__"))
      .groupBy(col("__iv__")).agg(agg.as("__sk__"))
      .collect()
    rows.foreach { r =>
      buckets.addTo(r.getLong(0), SketchAggregate.fromBytes(r.getAs[Array[Byte]](1)))
    }
    // Guard the driver's actual commitment, not the hypothetical worst case:
    // Space-Saving counters materialize only as keys arrive, so a big
    // `capacity` over few distinct keys is fine, while high cardinality ×
    // many retained intervals is the silent driver-OOM shape. For unbounded
    // cardinality use the state-store-backed
    // [[graft.streaming.StreamOps.windowedTopK]], which keeps per-window
    // state distributed across executors.
    val held = buckets.entryCount
    require(held <= opts.maxDriverEntries,
      s"TopK table '$name' holds $held counters on the driver across " +
        s"${buckets.intervals.size + buckets.history.size} retained buckets, " +
        s"exceeding maxDriverEntries ${opts.maxDriverEntries}. Lower " +
        "capacity/width/maxInterval, raise OPTIONS(maxDriverEntries ...), or " +
        "use graft.streaming.StreamOps.windowedTopK for unbounded cardinality.")
  }

  /** Point frequency estimate of a key over a time range. */
  def queryFrequency(key: Any, startMs: Long, endMs: Long): Option[(Long, Long, Long)] = {
    val startIv = if (startMs == Long.MinValue) Long.MinValue else intervalOf(startMs)
    val endIv = if (endMs == Long.MaxValue) Long.MaxValue else intervalOf(endMs)
    buckets.mergedRange(startIv, endIv).map(_.estimate(key))
  }

  /** Top-k rows of the merged [startMs, endMs] range plus the actual
   * covered bucket span in epoch ms (for the SQL scan's
   * `start_time`/`end_time` columns — [[TopKRelation]]). */
  def topKRows(startMs: Long, endMs: Long, k: Int): (Seq[(Any, Long, Long)], Long, Long) = {
    val startIv = if (startMs == Long.MinValue) Long.MinValue else intervalOf(startMs)
    val endIv = if (endMs == Long.MaxValue) Long.MaxValue else intervalOf(endMs)
    val rows = buckets.mergedRange(startIv, endIv).map(_.topK(k)).getOrElse(Nil)
    val (covS, covE) = buckets.coveredRange(startIv, endIv)
      .map { case (s, e) =>
        (s * opts.timeIntervalMs, (e + 1) * opts.timeIntervalMs - 1)
      }
      .getOrElse((0L, 0L))
    (rows, covS, covE)
  }

  /** Top-k between epoch times (ms), inclusive; Long.MinValue/MaxValue = open. */
  def queryTopK(spark: SparkSession, startMs: Long, endMs: Long, k: Int): DataFrame = {
    val rows = topKRows(startMs, endMs, k)._1.map { case (key, est, lower) =>
      Row(key, est, lower)
    }
    val schema = StructType(Seq(
      StructField(opts.key, keyType),
      StructField("estimated_value", LongType),
      StructField("lower_bound", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }
}
