package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase decomposition of q63 (sample snapshot read): store wipe + DDL
  * create (full-fraction sample write), fenced batch append, snapshot
  * read + aggregate — to attribute the gate's ~1 s wall (r16). */
object Q63Profile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val gs = graft.GraftSession(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.filter(col("doc_id") % 2 === 0)
      .createOrReplaceTempView("documents_q63p_half")
    for (pass <- 1 to 3) {
      println(s"--- pass $pass")
      val root = java.nio.file.Files.createTempDirectory("graft_q63p_").toString
      val path = s"$root/store"
      t("drop") { gs.sql("DROP SAMPLE TABLE IF EXISTS q63p_sample") }
      t("create+write") {
        gs.sql("CREATE SAMPLE TABLE q63p_sample ON documents_q63p_half " +
          s"OPTIONS(qcs 'lang', fraction '1.0', path '$path')")
      }
      t("append batch") {
        gs.appendToSampleForBatch("q63p_sample",
          docs.filter(col("doc_id") % 2 =!= 0), "q63p_stream", 0L)
      }
      t("snapshot+agg") {
        gs.readSample("q63p_sample")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("chars"))
          .orderBy(col("lang")).collect()
      }
    }
    spark.stop()
  }
}
