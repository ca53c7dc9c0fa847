package graft.tmp

import org.apache.spark.sql.SparkSession

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q39_stream_windowed")(spark, "/root/testdata/sf0.01")
    val rows = df.collect()
    println(s"q39 rows=${rows.length}")
    rows.take(5).foreach(println)
    spark.stop()
  }
}
