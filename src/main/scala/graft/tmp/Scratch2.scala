package graft.tmp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sampling.StratifiedSampler

object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val li = spark.read.parquet(dir + "/lineitem.parquet")
    li.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"TIMER $name ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    time("scan_all_cols")(li.select(xxhash64(struct(li.columns.map(col): _*)).as("h")).filter(col("h") =!= 0).count())
    time("counts_agg")(li.groupBy(col("l_returnflag")).count().count())
    time("sample_f01")(StratifiedSampler.sample(li, Seq("l_returnflag"), 0.1, 10).count())
    time("sample_f01_again")(StratifiedSampler.sample(li, Seq("l_returnflag"), 0.1, 10).count())
    time("sample_agg_q02")(StratifiedSampler.sample(li, Seq("l_returnflag"), 0.1, 10)
      .groupBy(col("l_returnflag")).agg(count(lit(1))).count())
    time("sample_full")(StratifiedSampler.sample(li, Seq("l_returnflag"), 1.0).count())
    spark.stop()
  }
}
