package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-off phase profile of q39's 2.07 s micro-batch latency floor (flat
 * since r3): times stream START, the two processAllAvailable fences, and
 * teardown separately, plus an AvailableNow-trigger variant, to decide
 * whether any restructuring could shave the floor WITHOUT changing the
 * two-batch watermark-advance semantics the gate exists to exercise.
 *
 * Usage: Test/runMain graft.perf.Q39Profile [sfDir]
 */
object Q39Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm the whole path once, then profile 3 passes
    def pass(tag: String): Unit = {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries("q39_stream_windowed")(spark, dir)
      val n = df.count()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"Q39 $tag total=$total%.2fs rows=$n")
    }
    pass("warmup")
    (1 to 3).foreach(i => pass(s"pass$i"))

    // phase breakdown: replicate the gate's structure with timers
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val ev = raw.select(expr(graft.TimeCol.asInstantSql("ts",
      raw.schema("ts").dataType, "ns")).as("ts"), col("event_type"))
    val bounds = ev.agg(
      expr("percentile_approx(cast(ts as long), 0.5)").as("mid"),
      max(col("ts").cast("long")).as("mx")).collect()(0)
    val mid = bounds.getLong(0)
    val root = java.nio.file.Files.createTempDirectory("graft_q39p_").toString
    import spark.implicits._
    val sentinel = Seq((new java.sql.Timestamp(
      (bounds.getLong(1) + 40L * 86400) * 1000L), "__sentinel__", 2))
      .toDF("ts", "event_type", "__b__")
    ev.withColumn("__b__",
      when(col("ts").cast("long") < mid, lit(1)).otherwise(lit(2)))
      .unionByName(sentinel)
      .write.partitionBy("__b__").mode("overwrite").parquet(s"$root/raw")

    (1 to 3).foreach { i =>
      val inDir = java.nio.file.Files.createTempDirectory("graft_q39p_in_")
      def release(b: Int): Unit = {
        val part = java.nio.file.Paths.get(s"$root/raw/__b__=$b")
        if (!java.nio.file.Files.isDirectory(part)) return
        val ls = java.nio.file.Files.list(part)
        try ls.forEach { p =>
          if (p.getFileName.toString.endsWith(".parquet"))
            java.nio.file.Files.createLink(
              inDir.resolve(s"b${b}_${p.getFileName}"), p)
        } finally ls.close()
      }
      val schema = StructType(Seq(StructField("ts", TimestampType),
        StructField("event_type", StringType)))
      val stream = spark.readStream.schema(schema).parquet(inDir.toString)
      val out = graft.streaming.StreamOps.windowedTopK(stream,
        keyCol = "event_type", tsCol = "ts", windowDuration = "1 day",
        watermarkDelay = "0 seconds", k = 100, streamSummary = true,
        capacity = 1000000)
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      var t = System.nanoTime()
      def lap(tag: String): Unit = {
        val now = System.nanoTime()
        println(f"Q39 phase$i $tag ${(now - t) / 1e9}%.2fs")
        t = now
      }
      val q =
        try out.writeStream.format("memory").queryName(s"q39p_$i")
          .outputMode("append").start()
        finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      lap("start")
      release(1); q.processAllAvailable(); lap("batch1")
      release(2); q.processAllAvailable(); lap("batch2")
      q.stop(); lap("stop")
      val n = spark.table(s"q39p_$i").count()
      lap(s"read(n=$n)")
    }
    spark.stop()
  }
}
