package graft.streaming

import java.util.regex.Pattern

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.GraftSession

/**
 * Continuous queries over SQL-declared stream tables — the Structured
 * Streaming re-expression of the reference's `registerCQ` + window clause
 * (`SnappyStreamingContext.registerCQ`, used throughout
 * `AQPStreamingSuite.scala:150-260`: `SELECT * FROM tweetstreamtable
 * window (duration 2 seconds, slide 2 seconds)` then `.foreachDataFrame`
 * / `saveStream` into sample and TopK tables).
 *
 * Semantics: the CQ fires every `slide`; each firing evaluates the query
 * over the rows that arrived in the trailing `duration`. With Structured
 * Streaming this maps onto a `foreachBatch` query triggered at `slide`,
 * holding the last `duration / slide` micro-batch frames in a bounded
 * deque — the window frame is their union, so `duration == slide` is
 * plain tumbling micro-batches (the only shape the reference suite uses)
 * and `duration == k·slide` overlaps the last k. Each batch frame stays a
 * distributed DataFrame (persisted, unpersisted on evict) — nothing is
 * collected to the driver, so a CQ is as scalable as the query it wraps.
 */
object StreamCq {

  private val WindowClause: Pattern = Pattern.compile(
    "(?is)\\bFROM\\s+([A-Za-z_][A-Za-z0-9_]*)\\s+WINDOW\\s*\\(\\s*" +
      "DURATION\\s+(\\d+)\\s*(MILLISECONDS?|MS|SECONDS?|SECS?|MINUTES?|MINS?)" +
      "(?:\\s*,\\s*SLIDE\\s+(\\d+)\\s*(MILLISECONDS?|MS|SECONDS?|SECS?|MINUTES?|MINS?))?" +
      "\\s*\\)")

  private def toMs(n: String, unit: String): Long = {
    val v = n.toLong
    unit.toLowerCase match {
      case u if u.startsWith("milli") || u == "ms" => v
      case u if u.startsWith("sec") => v * 1000L
      case u if u.startsWith("min") => v * 60000L
    }
  }

  /** Parse `... FROM <stream> WINDOW (DURATION n u [, SLIDE m u]) ...`,
   * returning an unstarted [[ContinuousQuery]]. Reference grammar:
   * `window (duration 2 seconds, slide 2 seconds)` — slide defaults to
   * duration (tumbling). */
  def registerCQ(gs: GraftSession, cqSql: String): ContinuousQuery = {
    val m = WindowClause.matcher(cqSql)
    if (!m.find()) {
      throw new IllegalArgumentException(
        "registerCQ needs a window clause: SELECT ... FROM <stream> " +
          "WINDOW (DURATION <n> <unit> [, SLIDE <n> <unit>])")
    }
    val streamName = m.group(1)
    val durationMs = toMs(m.group(2), m.group(3))
    val slideMs = Option(m.group(4)).map(toMs(_, m.group(5))).getOrElse(durationMs)
    require(durationMs > 0 && slideMs > 0, "window duration/slide must be positive")
    require(durationMs % slideMs == 0,
      s"window duration ($durationMs ms) must be a multiple of slide ($slideMs ms)")
    val d = gs.state.streams.getOrElse(streamName.toLowerCase,
      throw new IllegalArgumentException(s"No stream table named $streamName"))
    // the window clause names the frame; the query itself runs over a view
    // bound to each firing's frame
    val viewName = s"${d.name}__cq_${System.identityHashCode(cqSql)}"
    val rewritten = new StringBuilder(cqSql)
      .replace(m.start, m.end, s"FROM $viewName").toString
    new ContinuousQuery(gs, d, rewritten, viewName,
      windowBatches = (durationMs / slideMs).toInt, slideMs = slideMs)
  }
}

/** A registered-but-unstarted continuous query; `foreachWindow` (reference
 * `SchemaDStream.foreachDataFrame`) or `saveTo` (reference `saveStream`)
 * starts it. */
final class ContinuousQuery private[streaming](gs: GraftSession,
    d: StreamTableDef, rewrittenSql: String, viewName: String,
    windowBatches: Int, slideMs: Long) {

  /** Start the CQ: `f` receives each firing's query result plus the batch
   * id. The result frame is evaluated against the trailing
   * `windowBatches` micro-batches. */
  def foreachWindow(f: (DataFrame, Long) => Unit): StreamingQuery = {
    val recent = mutable.Queue.empty[DataFrame]
    StreamSql.sourceFor(gs.spark, d).writeStream
      .outputMode("append")
      // CQs are ephemeral per-session registrations (the reference re-registers
      // them per run) — a temp checkpoint is correct, unlike the durable
      // history populator
      .trigger(Trigger.ProcessingTime(slideMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          batch.persist()
          recent.enqueue(batch)
          while (recent.size > windowBatches) recent.dequeue().unpersist()
          val frame = recent.reduceLeft(_ unionByName _)
          // the micro-batch frame belongs to the stream's cloned session —
          // register the window view and evaluate the CQ there, not in the
          // outer session (whose catalog never sees the clone's temp views)
          frame.createOrReplaceTempView(viewName)
          f(frame.sparkSession.sql(rewrittenSql), batchId)
        }
        ()
      }
      .start()
  }

  /** Pipe each window frame into a registered sample table (reference
   * `saveStream(stream, Seq(sampleTable), None)` in the "sql stream
   * sampling" scenario): every firing's result is re-sampled per stratum
   * and appended. Use with a tumbling window — an overlapping frame would
   * double-append the overlap. */
  def saveTo(sampleTable: String): StreamingQuery =
    foreachWindow((df, batchId) =>
      gs.appendToSample(sampleTable, df, seed = 47L + batchId))
}
