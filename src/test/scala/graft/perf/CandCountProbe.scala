package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: candidate-pair count + banded-row bucket stats for the
 * minhash LSH path on a corpus (signature-scheme comparisons). */
object CandCountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1u")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val t0 = System.nanoTime()
    val n = graft.dedup.Dedup.lshCandidatePairIds(docs, "doc_id", "text").count()
    val secs = (System.nanoTime() - t0) / 1e9
    // bucket-occupancy histogram of the banding keys
    val sig = docs.filter(col("text").isNotNull)
      .select(col("doc_id").as("id"),
        graft.dedup.Dedup.minhashSignature(col("text")).as("sig"))
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(15)),
        b => xxhash64(slice(col("sig"), b * 8 + lit(1), lit(8)), b))))
    val occ = banded.groupBy(col("pos"), col("col")).count()
      .agg(count(lit(1)).as("buckets"), max(col("count")).as("max_occ"),
        sum(col("count") * (col("count") - 1) / 2).as("pairs_ub"))
      .collect()(0)
    println(f"CANDS sf=$sfDir pairs=$n time=$secs%.2fs buckets=${occ.getLong(0)} max_occ=${occ.getLong(1)} pairs_ub=${occ.getAs[Any](2)}")
    spark.stop()
  }
}
