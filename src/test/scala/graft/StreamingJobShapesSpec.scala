package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The remaining composite job shapes from the reference's streaming suite
 * (`AQPStreamingSuite.scala:129-330, 917-1050`), re-expressed over
 * file-source streams:
 *
 *  - "streamingAQPJob": TWO stream tables with one CQ each — one feeding a
 *    TopK, one feeding a store — plus a THIRD CQ registered dynamically
 *    AFTER the first queries are live; the TopK answers exactly through
 *    the concurrent feeds and the dynamic registration;
 *  - "SNAP-789": a CQ whose query is a grouped aggregate (WHERE +
 *    count(distinct) over a timestamp-carrying stream) whose every firing
 *    inserts into TWO sample tables; after STREAMING STOP the samples
 *    answer WITH ERROR queries consistently with the exact feed;
 *  - "sql stream sampling": saveStream into a sample table declared with
 *    time-slot strata (`timeSeriesColumn`/`timeInterval`) — the streamed
 *    rows land in per-slot strata and per-slot weighted counts stay exact
 *    at full fraction.
 */
class StreamingJobShapesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("streamingAQPJob: two streams, TopK + store feeds, dynamic CQ after start") {
    val gs = new GraftSession(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_job_").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/tags"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/rts"))
    def writeTags(rows: Seq[String]): Unit =
      rows.toDF("hashtag").coalesce(1).write.mode("append").parquet(s"$dir/tags")
    def writeRts(rows: Seq[(Long, Int)]): Unit =
      rows.toDF("retweet_id", "cnt").coalesce(1).write.mode("append")
        .parquet(s"$dir/rts")
    gs.sql("CREATE STREAM TABLE tags_job (hashtag string) USING parquet " +
      s"OPTIONS(path '$dir/tags')")
    gs.sql("CREATE STREAM TABLE rts_job (retweet_id long, cnt int) USING parquet " +
      s"OPTIONS(path '$dir/rts')")
    // seed view so the TopK DDL has a base; counts from it are asserted out
    Seq("seedtag").toDF("hashtag").createOrReplaceTempView("tags_job_seed")
    gs.sql("CREATE TOPK TABLE tags_job_topk ON tags_job_seed OPTIONS(" +
      "key 'hashtag', streamSummary 'true', capacity '100000', size '5')")
    try {
      val storeRows = new java.util.concurrent.atomic.AtomicLong(0)
      val dynamicFirings = new java.util.concurrent.atomic.AtomicInteger(0)
      val qTopk = gs.registerCQ(
        "SELECT hashtag FROM tags_job WINDOW (DURATION 1 SECONDS)")
        .foreachWindow((df, _) => gs.appendToTopK("tags_job_topk", df))
      val qStore = gs.registerCQ(
        "SELECT retweet_id, cnt FROM rts_job WINDOW (DURATION 1 SECONDS)")
        .foreachWindow((df, _) => { storeRows.addAndGet(df.count()); () })
      try {
        writeTags(Seq.fill(30)("spark") ++ Seq.fill(20)("aqp") ++ Seq.fill(10)("scala"))
        writeRts((1L to 40L).map(i => (i, i.toInt)))
        qTopk.processAllAvailable(); qStore.processAllAvailable()

        // dynamic CQ on a live stream table — reference registers a second
        // CQ on HASHTAGTABLE after snsc.start()
        val qDyn = gs.registerCQ(
          "SELECT hashtag, count(*) AS c FROM tags_job " +
            "WINDOW (DURATION 1 SECONDS) GROUP BY hashtag")
          .foreachWindow((_, _) => { dynamicFirings.incrementAndGet(); () })
        try {
          writeTags(Seq.fill(15)("spark") ++ Seq.fill(5)("flink"))
          writeRts((41L to 60L).map(i => (i, i.toInt)))
          qTopk.processAllAvailable(); qStore.processAllAvailable()
          qDyn.processAllAvailable()

          val top = gs.queryTopK("tags_job_topk", k = 5).collect()
            .map(r => r.getString(0) -> r.getLong(1)).toMap
          assert(top("spark") === 45L && top("aqp") === 20L &&
            top("scala") === 10L && top("flink") === 5L,
            s"TopK must be exact through two concurrent CQ feeds, got $top")
          assert(storeRows.get() === 60L,
            s"store CQ lost rows: ${storeRows.get()} of 60")
          assert(dynamicFirings.get() >= 1,
            "the dynamically registered CQ must fire on post-registration data")
        } finally qDyn.stop()
      } finally { qTopk.stop(); qStore.stop() }
    } finally {
      gs.sql("DROP TOPK TABLE IF EXISTS tags_job_topk")
      gs.sql("DROP STREAM TABLE IF EXISTS tags_job")
      gs.sql("DROP STREAM TABLE IF EXISTS rts_job")
    }
  }

  test("SNAP-789: grouped CQ with count(distinct) feeds two sample tables; WITH ERROR after stop") {
    val gs = new GraftSession(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_789_").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    def write(rows: Seq[(Long, String, String, Double, String)]): Unit =
      rows.toDF("t", "publisher", "geo", "bid", "cookie")
        .withColumn("time_stamp", timestamp_seconds(col("t"))).drop("t")
        .coalesce(1).write.mode("append").parquet(s"$dir/in")
    gs.sql("CREATE STREAM TABLE adimp_789 (publisher string, geo string, " +
      "bid double, cookie string, time_stamp timestamp) USING parquet " +
      s"OPTIONS(path '$dir/in')")
    gs.sql("CREATE SAMPLE TABLE adimp_789_s1 (time_stamp timestamp, " +
      "publisher string, geo string, avg_bid double, imps long, uniques long) " +
      "OPTIONS(qcs 'geo', fraction '1.0')")
    gs.sql("CREATE SAMPLE TABLE adimp_789_s2 (time_stamp timestamp, " +
      "publisher string, geo string, avg_bid double, imps long, uniques long) " +
      "OPTIONS(qcs 'geo', fraction '0.5', strataReservoirSize '5')")
    try {
      val exactImps = new java.util.concurrent.atomic.AtomicLong(0)
      val q = gs.registerCQ(
        "SELECT time_stamp, publisher, geo, avg(bid) AS avg_bid, " +
          "count(*) AS imps, count(distinct cookie) AS uniques " +
          "FROM adimp_789 WINDOW (DURATION 1 SECONDS) " +
          "WHERE geo != 'unknown' GROUP BY publisher, geo, time_stamp")
        .foreachWindow { (df, batchId) =>
          val frame = df.persist()
          exactImps.addAndGet(
            frame.agg(sum("imps")).collect()(0).getLong(0))
          gs.appendToSample("adimp_789_s1", frame, seed = 100L + batchId)
          gs.appendToSample("adimp_789_s2", frame, seed = 200L + batchId)
          frame.unpersist(blocking = false)
          ()
        }
      try {
        write((1L to 100L).map(i => (1000L + i % 3,
          s"pub${i % 4}", if (i % 10 == 0) "unknown" else s"geo${i % 5}",
          i * 0.5, s"c${i % 37}")))
        q.processAllAvailable()
        write((101L to 160L).map(i => (2000L + i % 2,
          s"pub${i % 4}", s"geo${i % 5}", i * 0.25, s"c${i % 23}")))
        q.processAllAvailable()
      } finally q.stop() // the reference's STREAMING STOP before runQuery

      // full-fraction sample: weighted totals equal the exact feed
      def num(v: Any): Double = v.asInstanceOf[java.lang.Number].doubleValue()
      val est1 = gs.sql(
        "SELECT sum(imps) AS total, absolute_error(total) FROM adimp_789_s1 " +
          "WITH ERROR").collect()(0)
      assert(num(est1.get(0)).round === exactImps.get(),
        s"s1 estimates ${est1.get(0)} of ${exactImps.get()} fed rows")
      // the 'unknown' geo never passed the CQ's WHERE
      assert(spark.table("adimp_789_s1")
        .filter(col("geo") === "unknown").count() === 0)
      // the half-fraction sample answers the same WITH ERROR query with
      // usable bounds (the reference only sanity-queries this table)
      val est2 = gs.sql(
        "SELECT sum(imps) AS total, lower_bound(total) AS lb, " +
          "upper_bound(total) AS ub FROM adimp_789_s2 WITH ERROR").collect()(0)
      assert(!est2.isNullAt(0) && num(est2.get(0)) > 0)
      assert(num(est2.get(1)) <= num(est2.get(0)) &&
        num(est2.get(0)) <= num(est2.get(2)))
    } finally {
      gs.sql("DROP SAMPLE TABLE IF EXISTS adimp_789_s1")
      gs.sql("DROP SAMPLE TABLE IF EXISTS adimp_789_s2")
      gs.sql("DROP STREAM TABLE IF EXISTS adimp_789")
    }
  }

  test("sql stream sampling: saveStream into time-slot-strata sample, per-slot exact") {
    val gs = new GraftSession(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_tss_").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    val dayMs = 86400000L
    def write(rows: Seq[(Long, String)]): Unit =
      rows.toDF("ts", "hashtag").coalesce(1).write.mode("append")
        .parquet(s"$dir/in")
    gs.sql("CREATE STREAM TABLE tweets_tss (ts long, hashtag string) " +
      s"USING parquet OPTIONS(path '$dir/in')")
    // reference shape: createSampleTable(schema, qcs + timeInterval) then
    // saveStream(stream, Seq(sample)) — time is part of the stratum key
    gs.sql("CREATE SAMPLE TABLE tweets_tss_sample (ts long, hashtag string) " +
      "OPTIONS(qcs 'hashtag', timeSeriesColumn 'ts', " +
      s"timeInterval '$dayMs', timeUnit 'ms', fraction '1.0')")
    try {
      val q = gs.registerCQ(
        "SELECT ts, hashtag FROM tweets_tss WINDOW (DURATION 1 SECONDS)")
        .saveTo("tweets_tss_sample")
      try {
        // day 0: 30 spark / 10 aqp; day 1: 20 spark
        write(Seq.fill(30)((100L, "spark")) ++ Seq.fill(10)((200L, "aqp")))
        q.processAllAvailable()
        write(Seq.fill(20)((dayMs + 50L, "spark")))
        q.processAllAvailable()
        val got = spark.table("tweets_tss_sample")
          .groupBy(col("hashtag"), expr(s"floor(ts / $dayMs)").as("day"))
          .agg(round(graft.functions.weighted_count(col("hashtag")), 4).as("est"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
        assert(got === Map(("spark", 0L) -> 30.0, ("aqp", 0L) -> 10.0,
          ("spark", 1L) -> 20.0),
          s"per-slot weighted counts must be exact at full fraction, got $got")
      } finally q.stop()
    } finally {
      gs.sql("DROP SAMPLE TABLE IF EXISTS tweets_tss_sample")
      gs.sql("DROP STREAM TABLE IF EXISTS tweets_tss")
    }
  }
}
