package graft.tmp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val docs = spark.read.parquet(dir + "/documents.parquet")
    // Spark-side BPE-ish token count total — compare to duckdb 27165
    val total = docs.select(sum(graft.text.TextFunctions.tokenCountBpe(col("text")))
      .cast("long")).collect()(0).getLong(0)
    println(s"SPARK_BPE_TOTAL=$total (duckdb said 27165)")
    spark.stop()
  }
}
