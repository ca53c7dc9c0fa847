package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for q51 (local iteration only): decomposes the
 * time-slot aging gate into its phases — the two whole-slot INSERTs
 * (each a full events scan + per-(type, day-slot) reservoir pass) and
 * the final weighted per-slot profile — to confirm the gate's wall time
 * is the honest cost of two sampling passes, not harness machinery. */
object Q51Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    val gs = graft.GraftSession(spark)
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.createOrReplaceTempView("events_q51p")
    val tsT = raw.schema("ts").dataType
    val cutPred = tsT match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        "TIMESTAMP_NTZ '2024-01-08 00:00:00'"
      case org.apache.spark.sql.types.TimestampType =>
        "timestamp_micros(1704672000000000L)"
      case _ => "1704672000000000000L"
    }
    for (pass <- 1 to 3) {
      println(s"--- pass $pass")
      gs.sql("DROP SAMPLE TABLE IF EXISTS events_q51p_sample")
      t("create (empty)") {
        gs.sql("CREATE SAMPLE TABLE events_q51p_sample " +
          s"(event_id long, ts ${tsT.sql}, user_id long, " +
          "event_type string, value double, props string) " +
          "OPTIONS(qcs 'event_type', timeSeriesColumn 'ts', " +
          "timeInterval '86400000', timeUnit 'ns', fraction '0.0', " +
          "strataReservoirSize '20')")
      }
      t("insert week 1") {
        gs.sql("INSERT INTO events_q51p_sample SELECT * FROM events_q51p " +
          s"WHERE ts < $cutPred")
      }
      t("insert week 2+") {
        gs.sql("INSERT INTO events_q51p_sample SELECT * FROM events_q51p " +
          s"WHERE ts >= $cutPred")
      }
      t("slot profile agg") {
        spark.table("events_q51p_sample")
          .groupBy(col("event_type"),
            expr(graft.TimeCol.slotSql("ts", Some(tsT), "ns", 86400000L))
              .as("slot_day"))
          .agg(count(lit(1)).as("kept"),
            round(graft.functions.weighted_count(col("event_type")), 4)
              .as("est_total"))
          .orderBy(col("event_type"), col("slot_day")).collect()
      }
    }
    spark.stop()
  }
}
