package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for q50 (local iteration only). */
object Q50Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.TextFunctions._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    for (pass <- 1 to 3) {
      println(s"--- pass $pass")
      val withCopies = docs.unionByName(
        docs.orderBy(col("doc_id")).limit(20)
          .withColumn("doc_id", col("doc_id") + lit(1000000L)))
      val filtered = withCopies
        .filter(tokenCountWs(col("text")) >= 5 &&
          repetitionRatio(col("text"), 3) < 0.5)
        .persist()
      t("materialize filter") { filtered.count() }
      val deduped = graft.dedup.Dedup.exact(filtered, "text", "doc_id")
        .persist()  // mirror the gate: the split reads the dedup cache
      t("dedup count") { deduped.count() }
      val split = graft.pipeline.Pipeline.stratifiedSplit(deduped, Seq(col("source")), 0.2)
      t("one hash scan") {
        val dataCols = deduped.columns.map(col).toSeq
        deduped.withColumn("__h__", xxhash64(struct(dataCols: _*), lit(42L)))
          .filter(col("__h__") % 1000 === 0)
          .write.format("noop").mode("overwrite").save()
      }
      t("split+agg collect") {
        split.groupBy(col("source"), col("split")).agg(count(lit(1)).as("n"))
          .orderBy(col("source"), col("split")).collect()
      }
      filtered.unpersist(blocking = true)
      deduped.unpersist(blocking = true)
    }
    spark.stop()
  }
}
