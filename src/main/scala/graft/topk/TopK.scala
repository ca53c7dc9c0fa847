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

  // ---------------------------------------------------------------------------
  // Interval spill store: when high key cardinality × many retained buckets
  // pushes the driver's counter commitment past maxDriverEntries, the OLDEST
  // buckets move to a parquet interval frame (`start`, `len`, `bytes` — one
  // row per bucket) and queries merge them back ON EXECUTORS: the scan
  // filters to the requested interval range, each partition merges its
  // buckets locally, and the driver folds one bounded partial per task
  // (each ≤ one interval sketch). The driver's live set stays under the
  // guard no matter how much history accumulates.
  // ---------------------------------------------------------------------------
  @transient private var sparkRef: SparkSession = _
  private var spillPath: Option[String] = None
  /** (startInterval, lengthInIntervals) of every spilled bucket — one tiny
   * tuple per bucket, for range overlap tests and covered-range math. */
  private val spilledSpans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]

  def spilledBucketCount: Int = spilledSpans.size

  /** Where this table's buckets spill (None until the first spill of a
   * non-path table) — exposed so DROP can retire the store. */
  def spillDirOption: Option[String] = spillPath

  /** Root directory for spilled buckets (set to `<path>/_graft_topk_spill`
   * for path-backed tables BEFORE the first append; a local temp directory
   * is created lazily otherwise). */
  def setSpillBase(dir: String): Unit = { spillPath = Some(dir) }

  /** Re-attach a persisted spill store (fresh-session restart of a
   * path-backed table): reload the span index from the parquet. */
  def attachSpill(spark: SparkSession, dir: String): Unit = {
    sparkRef = spark
    spillPath = Some(dir)
    spilledSpans.clear()
    spilledSpans ++= spark.read.parquet(dir).select(col("start"), col("len"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
  }

  private def sparkOrActive: SparkSession =
    Option(sparkRef).orElse(SparkSession.getActiveSession).getOrElse(
      throw new IllegalStateException(
        s"TopK table '$name' has spilled buckets but no active SparkSession"))

  private def ensureSpillDir(spark: SparkSession): String =
    spillPath.getOrElse {
      // not path-backed: spill under the warehouse dir — a SHARED filesystem
      // on a real cluster (a driver-local temp dir would be invisible to
      // executors reading the parquet back)
      val wh = spark.sessionState.conf.warehousePath.stripSuffix("/")
      val d = s"$wh/${graft.GraftSession.TopkSpillDir}/$name-" +
        java.util.UUID.randomUUID().toString.take(8)
      spillPath = Some(d)
      d
    }

  /** Move oldest buckets to the spill store until the driver is back under
   * its guard. History blocks predate every full-resolution interval, so
   * they go first; the newest interval always stays resident (appends merge
   * into it, and one sketch fits by the constructor check). */
  private def spillOldest(spark: SparkSession): Unit = {
    val moved = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Array[Byte])]
    while (buckets.entryCount > opts.maxDriverEntries &&
        (buckets.history.nonEmpty || buckets.intervals.size > 1)) {
      if (buckets.history.nonEmpty) {
        val ((hs, hl), s) = buckets.history.head
        buckets.history.remove((hs, hl))
        moved += ((hs, hl, IntervalSketch.toBytes(s)))
      } else {
        val (iv, s) = buckets.intervals.head
        buckets.intervals.remove(iv)
        moved += ((iv, 1L, IntervalSketch.toBytes(s)))
      }
    }
    if (moved.nonEmpty) {
      val dir = ensureSpillDir(spark)
      import spark.implicits._
      spark.createDataset(moved.toSeq).toDF("start", "len", "bytes")
        .coalesce(1).write.mode("append").parquet(dir)
      spilledSpans ++= moved.map(m => (m._1, m._2))
    }
  }

  private def spanOverlaps(startIv: Long, endIv: Long)(span: (Long, Long)): Boolean =
    span._1 <= endIv && (span._1 + span._2 - 1) >= startIv

  /** Executor-side merge of the spilled buckets overlapping the range:
   * filtered parquet scan → per-partition merge → one bounded partial per
   * task folded on the driver. */
  private def spillMerged(startIv: Long, endIv: Long): Option[IntervalSketch] = {
    if (!spilledSpans.exists(spanOverlaps(startIv, endIv))) return None
    val spark = sparkOrActive
    val df = spark.read.parquet(spillPath.get)
    val startCond =
      if (endIv == Long.MaxValue) lit(true) else col("start") <= lit(endIv)
    val endCond =
      if (startIv == Long.MinValue) lit(true)
      else col("start") + col("len") - lit(1L) >= lit(startIv)
    val rdd = df.filter(startCond && endCond).select(col("bytes"))
      .rdd.map(r => IntervalSketch.fromBytes(r.getAs[Array[Byte]](0)))
    // the span index is exact (spillOldest and attachSpill keep it in sync
    // with the parquet rows), so the overlap pre-check above guarantees a
    // non-empty scan — one job, not an isEmpty probe plus a reduce
    Some(rdd.reduce(_.mergeWith(_)))
  }

  /** Driver-resident + spilled buckets merged over the range. */
  private def mergedAll(startIv: Long, endIv: Long): Option[IntervalSketch] =
    (buckets.mergedRange(startIv, endIv).toSeq ++
      spillMerged(startIv, endIv).toSeq).reduceOption(_.mergeWith(_))

  /** [[TimeBucketedSketch.coveredRange]] extended with spilled spans. */
  private def coveredAll(startIv: Long, endIv: Long): Option[(Long, Long)] = {
    val resident = buckets.coveredRange(startIv, endIv)
    val spilled = spilledSpans.filter(spanOverlaps(startIv, endIv))
    if (spilled.isEmpty) resident
    else {
      val sMin = spilled.map(_._1).min
      val sMax = spilled.map(s => s._1 + s._2 - 1).max
      Some(resident match {
        case Some((rs, re)) => (math.min(rs, sMin), math.max(re, sMax))
        case None => (sMin, sMax)
      })
    }
  }

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
        // integral `div` end-to-end for integer epochs: ns values exceed
        // 2^53, where double division quantizes to ~256 ns and mis-buckets
        // events near an interval boundary (same rule as the sampler's
        // time-slot strata)
        (opts.timeUnit, tsType) match {
          case ("ns", _) =>
            expr(s"CAST($ts AS BIGINT) div ${opts.timeIntervalMs * 1000000L}L")
          case ("ms", _) =>
            expr(s"CAST($ts AS BIGINT) div ${opts.timeIntervalMs}L")
          case ("s", _) =>
            expr(s"(CAST($ts AS BIGINT) * 1000L) div ${opts.timeIntervalMs}L")
          case (_, Some(TimestampType)) =>
            floor(col(ts).cast("double") * lit(1000.0) /
              opts.timeIntervalMs.toDouble).cast(LongType)
          case _ => // assume epoch millis
            expr(s"CAST($ts AS BIGINT) div ${opts.timeIntervalMs}L")
        }
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
    // many retained intervals is the silent driver-OOM shape. Over the
    // guard, the oldest buckets spill to the parquet interval store and
    // queries merge them back on executors; only late-arriving data for a
    // spilled interval re-materializes a (mergeable) driver bucket.
    sparkRef = df.sparkSession
    if (buckets.entryCount > opts.maxDriverEntries) spillOldest(df.sparkSession)
  }

  /** Point frequency estimate of a key over a time range. */
  def queryFrequency(key: Any, startMs: Long, endMs: Long): Option[(Long, Long, Long)] = {
    val startIv = if (startMs == Long.MinValue) Long.MinValue else intervalOf(startMs)
    val endIv = if (endMs == Long.MaxValue) Long.MaxValue else intervalOf(endMs)
    mergedAll(startIv, endIv).map(_.estimate(key))
  }

  /** Top-k rows of the merged [startMs, endMs] range plus the actual
   * covered bucket span in epoch ms (for the SQL scan's
   * `start_time`/`end_time` columns — [[TopKRelation]]). */
  def topKRows(startMs: Long, endMs: Long, k: Int): (Seq[(Any, Long, Long)], Long, Long) = {
    val startIv = if (startMs == Long.MinValue) Long.MinValue else intervalOf(startMs)
    val endIv = if (endMs == Long.MaxValue) Long.MaxValue else intervalOf(endMs)
    val rows = mergedAll(startIv, endIv).map(_.topK(k)).getOrElse(Nil)
    val (covS, covE) = coveredAll(startIv, endIv)
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
