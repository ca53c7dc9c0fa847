package graft.tmp
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(dir + "/documents.parquet").count()
    spark.read.parquet(dir + "/embeddings.parquet").count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"TIMER $name ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    for (q <- Seq("q26_contamination", "q11_minhash_lsh", "q12_simhash",
                  "q13_knn_brute", "q25_chunking", "q14_knn_lsh", "q15_multimodal",
                  "q27_ngram_jaccard", "q28_embedding_dedup", "q29_knn_ivf"))
      time(q)(graft.SparkEntry.queries(q)(spark, dir).count())
    spark.stop()
  }
}
