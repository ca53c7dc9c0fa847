package graft.topk

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext, SparkSession}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/**
 * SQL scan of a TopK structure with time-range pruning, the analogue of the
 * reference's `TopKRelation.buildScan` `PrunedFilteredScan` (reference
 * `sql/topk/TopKRelation.scala:59-86`, schema `approximate/TopKUtil.scala:
 * 40-56`): `SELECT * FROM topkName WHERE start_time >= a AND end_time <= b`
 * prunes sketch intervals to [a, b] before the merge, instead of merging
 * the whole history.
 *
 * `start_time`/`end_time` are TIMESTAMP columns. The reference types its
 * `StartTime`/`EndTime` as strings (`TopKUtil.scala:43-45`) so both
 * timestamp-string predicates (`start_time = '2024-01-02 00:00:00'`, the
 * SNAP-463 SQL shape) and numeric ones can reach its scan; under Spark's
 * ANSI analyzer a string column breaks the numeric form (the attribute gets
 * cast-wrapped and the filter never pushes down). A timestamp column keeps
 * BOTH forms working: string literals coerce to timestamp literals, epoch
 * numbers arrive via `timestamp_millis(...)`, and in each case the bare
 * attribute pushes the bound into the sketch merge.
 *
 * Emitted rows echo the queried bound clamped to milliseconds, so the
 * re-applied predicate above the scan (every filter is also re-checked by
 * Spark — `unhandledFilters` returns all of them, making pruning purely a
 * performance contract) accepts exactly the rows it asked for. Bounds with
 * sub-millisecond precision are not supported (the sketch's interval
 * resolution is milliseconds).
 *
 * The scan reads the live [[TopKState]], so appends are visible without
 * re-registering the view.
 */
final class TopKRelation(st: TopKState, spark: SparkSession)
    extends BaseRelation with PrunedFilteredScan {

  override def sqlContext: SQLContext = spark.sqlContext

  override val schema: StructType = StructType(Seq(
    StructField(st.opts.key, st.keyType),
    StructField("estimated_value", LongType),
    StructField("lower_bound", LongType),
    // the reference's ApproximateType UDT (CMS `ErrorBoundsInfo`) /
    // DeltaError (Space-Saving), flattened to one plain struct
    StructField("error_bounds_info", TopKState.ErrorBoundsType),
    StructField("start_time", TimestampType),
    StructField("end_time", TimestampType)))

  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  private def asMs(v: Any): Long = v match {
    case n: java.lang.Number => n.longValue()
    case t: java.sql.Timestamp => t.getTime
    case i: java.time.Instant => i.toEpochMilli
    // timestamp-string bounds parse like the API's string window (the
    // reference's relation receives its StartTime/EndTime predicates as
    // strings — `sql/topk/TopKRelation.scala:60-74`), in the SESSION zone
    // so both query forms resolve the same instant
    case other => graft.GraftSession.parseTimestampMs(other.toString, 0L,
      graft.GraftSession.sessionZone(spark))
  }

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    var startMs = Long.MinValue
    var endMs = Long.MaxValue
    filters.foreach {
      case EqualTo("start_time", v) => startMs = math.max(startMs, asMs(v))
      case GreaterThanOrEqual("start_time", v) => startMs = math.max(startMs, asMs(v))
      case GreaterThan("start_time", v) => startMs = math.max(startMs, asMs(v) + 1)
      case EqualTo("end_time", v) => endMs = math.min(endMs, asMs(v))
      case LessThanOrEqual("end_time", v) => endMs = math.min(endMs, asMs(v))
      case LessThan("end_time", v) => endMs = math.min(endMs, asMs(v) - 1)
      case _ => // key/other predicates: re-applied by Spark above the scan
    }
    val (rows, covStart, covEnd) = st.topKRows(startMs, endMs, st.opts.size)
    val outStart = new java.sql.Timestamp(
      if (startMs == Long.MinValue) covStart else startMs)
    val outEnd = new java.sql.Timestamp(
      if (endMs == Long.MaxValue) covEnd else endMs)
    val conf = st.boundsConfidence
    val out = rows.map { case (key, est, lb, up) =>
      Row.fromSeq(requiredColumns.toSeq.map {
        case c if c.equalsIgnoreCase(st.opts.key) => key
        case "estimated_value" => est
        case "lower_bound" => lb
        case "error_bounds_info" => Row(lb, est, up, conf)
        case "start_time" => outStart
        case "end_time" => outEnd
        case other => throw new IllegalArgumentException(s"unknown column $other")
      })
    }
    spark.sparkContext.parallelize(out, 1)
  }
}
