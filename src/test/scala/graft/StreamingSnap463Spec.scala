package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The reference's SNAP-463 family (`AQPStreamingSuite.scala:344-655`) runs a
 * stream-fed timed TopK through every relationship between the sketch's
 * `timeInterval` and the micro-batch cadence: interval > batch span,
 * interval < batch span, interval = batch span, and no interval at all —
 * then checks the SQL window scan (`WHERE start_time='..' AND end_time='..'`
 * with timestamp strings) against the `queryApproxTSTopK` string API.
 *
 * The stream carries a TIMESTAMP_NTZ event-time column, so this also pins
 * the timestamp ingestion path end to end through the streaming sink.
 */
class StreamingSnap463Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val T0 = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
  private def ldt(hours: Long) = T0.plusHours(hours)
  private val epochMs0 = 1704067200000L // 2024-01-01T00:00:00Z

  /** Feed two event-time batches (hours [0,48) then [48,120)) through a
   * CREATE STREAM TABLE with a dependent timed TopK; return exact
   * (key → count) for a predicate. */
  private def runCase(name: String, topkOpts: String)(
      check: (GraftSession, String) => Unit): Unit = {
    val gs = new GraftSession(spark)
    val srcDir = java.nio.file.Files.createTempDirectory(s"graft_463_$name").toString
    def feed(rows: Seq[(java.time.LocalDateTime, String)]): Unit =
      rows.toDF("ts", "event_type")
        .coalesce(1).write.mode("append").parquet(s"$srcDir/in")
    // batch 1: hours 0..47 (2 days); key frequency skewed by construction
    feed((0L until 48L).flatMap(h =>
      Seq.fill((h % 3 + 1).toInt)((ldt(h), if (h % 2 == 0) "click" else "view"))))
    gs.sql("STREAMING INIT 0 MS")
    gs.sql(s"CREATE STREAM TABLE ev463_$name (ts timestamp_ntz, event_type string) " +
      s"USING parquet OPTIONS(path '$srcDir/in', " +
      s"historypath '$srcDir/history', maxFilesPerTrigger '1')")
    gs.sql(s"CREATE TOPK TABLE tk463_$name ON ev463_$name OPTIONS(" +
      s"key 'event_type', streamSummary 'true', capacity '100000', size '10'" +
      (if (topkOpts.nonEmpty) s", $topkOpts" else "") + ")")
    gs.sql("STREAMING START")
    try {
      gs.state.activeStreams(s"ev463_$name").processAllAvailable()
      // batch 2: hours 48..119 (3 days), new key appears
      feed((48L until 120L).flatMap(h =>
        Seq.fill((h % 2 + 1).toInt)((ldt(h),
          if (h % 5 == 0) "purchase" else if (h % 2 == 0) "click" else "view"))))
      gs.state.activeStreams(s"ev463_$name").processAllAvailable()
      check(gs, name)
    } finally {
      gs.sql("STREAMING STOP")
      gs.sql(s"DROP TOPK TABLE IF EXISTS tk463_$name")
      gs.sql(s"DROP STREAM TABLE IF EXISTS ev463_$name")
    }
  }

  private def exactCounts(name: String, fromH: Long = 0L, untilH: Long = 120L) =
    spark.table(s"ev463_$name")
      .filter(col("ts") >= ldt(fromH) && col("ts") < ldt(untilH))
      .groupBy("event_type").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (k, c) => (-c, k) }.toSeq

  private def topkCounts(gs: GraftSession, name: String,
      startMs: Long = Long.MinValue, endMs: Long = Long.MaxValue) =
    gs.queryTopK(s"tk463_$name", startMs, endMs, 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  test("interval > batch span: buckets span batches; full and windowed queries exact") {
    // 10-day interval vs 2-3-day batches — every event lands in one bucket
    runCase("big", "timeSeriesColumn 'ts', timeInterval '864000000', maxInterval '100'") {
      (gs, name) =>
        assert(topkCounts(gs, name) === exactCounts(name))
    }
  }

  test("interval < batch span: one batch fans into many buckets; window prunes exactly") {
    // 1-day interval vs multi-day batches; whole-day window bounds align
    // with bucket boundaries so pruned merges stay exact
    runCase("small", "timeSeriesColumn 'ts', timeInterval '86400000', maxInterval '100'") {
      (gs, name) =>
        assert(topkCounts(gs, name) === exactCounts(name))
        // days 2-3 only (hours 24..72): crosses the batch boundary
        val win = topkCounts(gs, name,
          epochMs0 + 24L * 3600000, epochMs0 + 72L * 3600000 - 1)
        assert(win === exactCounts(name, 24, 72))
    }
  }

  test("interval = batch span: one bucket per batch") {
    // 48h interval = batch 1's exact span; batch 2 spans 1.5 buckets.
    // Buckets are EPOCH-aligned, not stream-start-aligned: Jan 1 2024 is an
    // odd day index, so the 48h bucket containing the stream's start spans
    // Dec 31-Jan 2 and the windowed probe must use bucket boundaries
    // [Jan 2, Jan 4) = stream hours [24, 72)
    runCase("eq", "timeSeriesColumn 'ts', timeInterval '172800000', maxInterval '100'") {
      (gs, name) =>
        assert(topkCounts(gs, name) === exactCounts(name))
        val win = topkCounts(gs, name,
          epochMs0 + 24L * 3600000, epochMs0 + 72L * 3600000 - 1)
        assert(win === exactCounts(name, 24, 72))
    }
  }

  test("without time interval: single-bucket TopK still tracks the whole stream") {
    runCase("flat", "") { (gs, name) =>
      assert(topkCounts(gs, name) === exactCounts(name))
    }
  }

  test("SQL timestamp-string window equals the queryApproxTSTopK string API (SNAP-463 tail)") {
    runCase("sqlwin", "timeSeriesColumn 'ts', timeInterval '86400000', maxInterval '100'") {
      (gs, name) =>
        val startStr = "2024-01-02 00:00:00"
        val endStr = "2024-01-03 23:59:59.999"
        val viaSql = spark.sql(
          s"""SELECT event_type, estimated_value FROM tk463_$name
             |WHERE start_time = '$startStr' AND end_time = '$endStr'
             |ORDER BY estimated_value DESC, event_type""".stripMargin)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        val viaApi = gs.queryApproxTSTopK(s"tk463_$name", startStr, endStr)
          .orderBy(col("estimated_value").desc, col("event_type")).collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq
        assert(viaSql === viaApi)
        assert(viaSql === exactCounts(name, 24, 72))
    }
  }
}
