package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The same event stream encoded as long-nanos, TIMESTAMP_NTZ, and TIMESTAMP
 * must produce IDENTICAL time buckets everywhere a time-series column is
 * consumed (TopK intervals, time-slot strata, streaming instants) — the
 * reference accepts both integer-epoch and Timestamp columns in these paths
 * (`execution/TopKWrapper.scala:105-116`).
 */
class TimeColSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val longNs = eventsLongNs(spark)

  /** the three encodings of the same instant stream */
  private def variants = Seq(
    "long_ns" -> longNs,
    "ntz" -> longNs.withColumn("ts",
      expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")),
    "ltz" -> longNs.withColumn("ts", expr("timestamp_micros(ts div 1000)")))

  test("epochMicros agrees across long-ns / NTZ / LTZ encodings") {
    val expect = longNs.select(expr("ts div 1000").as("us"))
      .orderBy("us").limit(100).collect().map(_.getLong(0)).toSeq
    variants.foreach { case (name, df) =>
      val dt = df.schema("ts").dataType
      val got = df.select(expr(TimeCol.epochMicrosSql("ts", Some(dt), "ns")).as("us"))
        .orderBy("us").limit(100).collect().map(_.getLong(0)).toSeq
      assert(got === expect, s"variant $name")
    }
  }

  test("NTZ epoch extraction is session-timezone independent") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.session.timeZone")
    // materialize the NTZ wall times as tz-free LocalDateTime values FIRST —
    // building the NTZ column lazily via cast would re-render it under each
    // session tz and test the fixture, not the extraction
    val walls = variants(1)._2.select(col("ts")).orderBy("ts").limit(50)
      .collect().map(_.getAs[java.time.LocalDateTime](0)).toSeq
    def epochs() = walls.toDF("ts")
      .select(expr(TimeCol.epochMicrosSql("ts", Some(TimestampNTZType))).as("us"))
      .orderBy("us").collect().map(_.getLong(0)).toSeq
    val atUtc = epochs()
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      assert(epochs() === atUtc)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
    // and reading the walls as UTC reproduces the instant stream's epochs
    val expect = longNs.select(expr("ts div 1000").as("us"))
      .orderBy("us").limit(50).collect().map(_.getLong(0)).toSeq
    assert(atUtc === expect)
  }

  test("TopK over a timestamp column matches TopK over long nanos, windows included") {
    val gs = new GraftSession(spark)
    val results = variants.map { case (name, df) =>
      df.createOrReplaceTempView(s"ev_tc_$name")
      // declared timeUnit 'ns' everywhere: the ACTUAL column type must win
      // for the timestamp variants
      gs.sql(s"CREATE TOPK TABLE tk_tc_$name ON ev_tc_$name OPTIONS(" +
        "key 'event_type', streamSummary 'true', capacity '100000', " +
        "size '5', timeSeriesColumn 'ts', timeInterval '86400000', " +
        "maxInterval '100', timeUnit 'ns')")
      val full = gs.queryTopK(s"tk_tc_$name", k = 5).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      val win = gs.queryTopK(s"tk_tc_$name",
        1704067200000L, 1704671999999L, 5).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      name -> (full, win)
    }
    val (_, expect) = results.head
    results.tail.foreach { case (name, got) =>
      assert(got === expect, s"variant $name")
    }
    // Space-Saving below capacity is exact: the window answer equals SQL
    val exact = longNs.filter(
        expr("ts >= 1704067200000000000L AND ts < 1704672000000000000L"))
      .groupBy("event_type").count()
      .orderBy(col("count").desc, col("event_type"))
      .limit(5).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(results.head._2._2 === exact)
  }

  test("time-slot strata agree across encodings (same kept rows per slot)") {
    val gs = new GraftSession(spark)
    val profiles = variants.map { case (name, df) =>
      df.createOrReplaceTempView(s"ev_ts_$name")
      gs.sql(s"CREATE SAMPLE TABLE sm_tc_$name ON ev_ts_$name OPTIONS(" +
        "qcs 'event_type', timeSeriesColumn 'ts', timeInterval '86400000', " +
        "timeUnit 'ns', fraction '0.0', strataReservoirSize '7')")
      val dt = df.schema("ts").dataType
      val prof = spark.table(s"sm_tc_$name")
        .groupBy(col("event_type"),
          expr(TimeCol.slotSql("ts", Some(dt), "ns", 86400000L)).as("slot"))
        .agg(count(lit(1)).as("kept"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      name -> prof
    }
    val (_, expect) = profiles.head
    assert(expect.nonEmpty && expect.values.forall(_ <= 7))
    profiles.tail.foreach { case (name, got) =>
      assert(got === expect, s"variant $name")
    }
  }

  test("asInstantSql yields the same instants for every encoding") {
    val expect = longNs
      .select(expr("timestamp_micros(ts div 1000)").cast("long").as("sec"))
      .orderBy("sec").limit(50).collect().map(_.getLong(0)).toSeq
    variants.foreach { case (name, df) =>
      val dt = df.schema("ts").dataType
      val got = df
        .select(expr(TimeCol.asInstantSql("ts", dt, "ns")).cast("long").as("sec"))
        .orderBy("sec").limit(50).collect().map(_.getLong(0)).toSeq
      assert(got === expect, s"variant $name")
    }
  }

  test("parseTimestampMs resolves wall strings in the GIVEN zone, not the JVM's") {
    import java.time.ZoneId
    val utc = ZoneId.of("UTC")
    val ny = ZoneId.of("America/New_York")
    // the SQL analyzer coerces '2024-01-02 00:00:00' in the SESSION zone;
    // the string API must agree (SNAP-463 equivalence) — so the zone is an
    // explicit argument and the JVM default never participates
    assert(GraftSession.parseTimestampMs("2024-01-02 00:00:00", 0L, utc) ===
      1704153600000L)
    assert(GraftSession.parseTimestampMs("2024-01-02 00:00:00", 0L, ny) ===
      1704153600000L + 5L * 3600 * 1000)
    // fractional seconds and date-only forms
    assert(GraftSession.parseTimestampMs("2024-01-02 00:00:00.250", 0L, utc) ===
      1704153600250L)
    assert(GraftSession.parseTimestampMs("2024-01-02", 0L, utc) === 1704153600000L)
    // pure numbers are epoch ms in any zone; empty = default
    assert(GraftSession.parseTimestampMs("123456", 0L, ny) === 123456L)
    assert(GraftSession.parseTimestampMs("", 7L, ny) === 7L)
  }
}
