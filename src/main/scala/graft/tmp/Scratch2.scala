package graft.tmp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(dir + "/documents.parquet")
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"TIMER $name ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    val n = 8
    def grams(df: org.apache.spark.sql.DataFrame, out: String) = df
      .select(col("doc_id").as(out),
        explode(array_distinct(transform(graft.dedup.Dedup.wordNgrams(col("text"), n),
          g => xxhash64(g)))).as("__gh__"))

    val corpus = docs.select(col("doc_id"), col("text"))
    val eval = docs.orderBy(col("doc_id")).limit(5).select(col("doc_id"), col("text"))

    time("cg_alone")(grams(graft.core.Fanout(corpus), "corpus_id").count())
    time("rg_alone")(grams(eval, "ref_id").select(col("__gh__")).distinct().count())
    val cg = grams(graft.core.Fanout(corpus), "corpus_id")
    val rg = grams(eval, "ref_id").select(col("__gh__")).distinct()
    time("join_only")(cg.join(broadcast(rg), Seq("__gh__"), "inner").count())
    time("full_contam")(graft.pipeline.Pipeline.contaminationCheck(
      corpus, eval, "doc_id", "text", n = 8, minShared = 3).count())
    time("full_contam2")(graft.pipeline.Pipeline.contaminationCheck(
      corpus, eval, "doc_id", "text", n = 8, minShared = 3).count())
    spark.stop()
  }
}
