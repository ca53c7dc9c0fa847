package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamSinks

class StreamingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("topk sink accumulates micro-batches into the sketch") {
    val gs = new GraftSession(spark)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("user_id", "event_type")

    val q = StreamSinks.topkSink(gs, "stream_tk", stream,
      Map("key" -> "event_type", "streamsummary" -> "true",
        "capacity" -> "10000", "size" -> "5"))
    mem.addData((1L, "click"), (2L, "click"), (3L, "view"))
    q.processAllAvailable()
    mem.addData((4L, "click"), (5L, "view"), (6L, "scroll"))
    q.processAllAvailable()
    q.stop()

    val top = gs.queryTopK("stream_tk", k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(top.toSeq === Seq(("click", 3L), ("view", 2L), ("scroll", 1L)))
  }

  test("sample sink: streaming stratified sample answers weighted queries") {
    val gs = new GraftSession(spark)
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_sample").toString
    val mem = MemoryStream[(Long, String, Double)]
    val stream = mem.toDF().toDF("id", "grp", "v")
    // register a batch view standing for the stream's full history
    val history = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Double)]

    val batch1 = (1L to 400L).map(i => (i, if (i % 2 == 0) "a" else "b", i.toDouble))
    val batch2 = (401L to 1000L).map(i => (i, if (i % 3 == 0) "a" else "b", i.toDouble))
    history ++= batch1 ++= batch2
    history.toSeq.toDF("id", "grp", "v").createOrReplaceTempView("stream_history")

    val q = StreamSinks.sampleSink(gs, "stream_sample", "stream_history", stream,
      qcs = Seq("grp"), fraction = 0.25, path = s"$dir/sample")
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    // the accumulated per-batch samples answer weighted queries over history
    val est = spark.table("stream_sample")
      .agg(graft.functions.weighted_count(col("id"))).collect()(0).getDouble(0)
    assert(math.abs(est - 1000.0) / 1000.0 < 0.05, s"estimated $est of 1000")

    // and the registered sample powers the WITH ERROR SQL path
    val viaSql = gs.sql(
      "SELECT count(*) AS c FROM stream_history WITH ERROR 0.5").collect()(0).getLong(0)
    assert(math.abs(viaSql - 1000.0) / 1000.0 < 0.05)
    gs.dropSampleTable("stream_sample")
  }

  test("windowedTopK: watermarked windowed sketch agg, fully distributed") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val stream = mem.toDF().toDF("ts", "event_type")

    val out = graft.streaming.StreamOps.windowedTopK(
      stream, keyCol = "event_type", tsCol = "ts",
      windowDuration = "1 minute", watermarkDelay = "0 seconds", k = 3)
    val q = out.writeStream.format("memory").queryName("wtk")
      .outputMode("append").start()

    def t(min: Int, sec: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")
    // window 10:00: click x3, view x1 — window 10:01: view x2
    mem.addData((t(0, 5), "click"), (t(0, 10), "click"), (t(0, 20), "view"),
      (t(0, 40), "click"), (t(1, 10), "view"), (t(1, 20), "view"))
    q.processAllAvailable()
    // advance the watermark past both windows so append mode emits them
    mem.addData((t(30, 0), "late_marker"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("wtk")
      .select(col("window_start"), col("event_type"), col("estimated_value"))
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      .toSet
    assert(rows.contains(("2024-01-01 10:00:00.0", "click", 3L)))
    assert(rows.contains(("2024-01-01 10:00:00.0", "view", 1L)))
    assert(rows.contains(("2024-01-01 10:01:00.0", "view", 2L)))
  }

  test("windowedTopK: events behind the watermark are dropped, not misattributed") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val stream = mem.toDF().toDF("ts", "event_type")
    val out = graft.streaming.StreamOps.windowedTopK(
      stream, keyCol = "event_type", tsCol = "ts",
      windowDuration = "1 minute", watermarkDelay = "0 seconds", k = 5)
    val q = out.writeStream.format("memory").queryName("wtk_late")
      .outputMode("append").start()
    def t(min: Int, sec: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")
    mem.addData((t(0, 5), "click"), (t(0, 10), "click"))
    q.processAllAvailable()
    // advance watermark far past window 10:00 (closes + emits it)
    mem.addData((t(30, 0), "marker"))
    q.processAllAvailable()
    // a LATE click for the already-closed 10:00 window: 0-second delay
    // watermark semantics say it must be dropped
    mem.addData((t(0, 50), "click"))
    q.processAllAvailable()
    mem.addData((t(60, 0), "marker2"))
    q.processAllAvailable()
    q.stop()
    val clicks = spark.table("wtk_late")
      .filter(col("event_type") === "click")
      .select(col("window_start"), col("event_type"), col("estimated_value"))
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(2)))
    assert(clicks.toSeq === Seq(("2024-01-01 10:00:00.0", 2L)),
      s"late event leaked: ${clicks.toSeq}") // not 3, and no duplicate window
  }

  test("runningCounts: flatMapGroupsWithState accumulates across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val stream = mem.toDF().toDF("k")

    val out = graft.streaming.StreamOps.runningCounts(stream, "k")
    val q = out.writeStream.format("memory").queryName("rc")
      .outputMode("update").start()
    mem.addData("a", "a", "b")
    q.processAllAvailable()
    mem.addData("a", "b", "c")
    q.processAllAvailable()
    q.stop()

    // last update per key wins
    val last = spark.table("rc").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    assert(last === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }
}
