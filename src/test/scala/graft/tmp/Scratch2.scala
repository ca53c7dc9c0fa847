package graft.tmp
import org.apache.spark.sql.SparkSession
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    spark.read.parquet(dir + "/documents.parquet").count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"TIMER $name ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    // warm at small scale like the bench does
    graft.SparkEntry.queries("q33_dedup_clusters")(spark, "/root/testdata/sf0.001").count()
    time("q33_a")(graft.SparkEntry.queries("q33_dedup_clusters")(spark, dir).count())
    time("q33_b")(graft.SparkEntry.queries("q33_dedup_clusters")(spark, dir).count())
    time("q11_ref")(graft.SparkEntry.queries("q11_minhash_lsh")(spark, dir).count())
    spark.stop()
  }
}
