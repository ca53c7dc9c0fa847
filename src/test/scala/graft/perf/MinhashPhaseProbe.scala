package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase decomposition of the minhash-LSH candidate pass (q11/q27/q33's
 * shared dominant term): signature compute vs banding join vs distinct. */
object MinhashPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10u")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      val sig = docs.filter(col("text").isNotNull)
        .select(col("doc_id").as("id"),
          graft.dedup.Dedup.minhashSignature(col("text")).as("sig"))
      t("signature pass (agg count)") {
        // bit_count keeps the fold tiny (ANSI sum of raw longs overflows)
        sig.select(sum(bit_count(element_at(col("sig"), 1)))).collect()
        docs.count()
      }
      val banded = sig.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(15)),
          b => xxhash64(slice(col("sig"), b * 8 + lit(1), lit(8)), b))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      t("banded rows (count)") { banded.count() }
      val hint = graft.core.CandidateJoin.maybeShuffleHash(sig) _
      val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
      val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
      val joined = hint(a).join(hint(b), Seq("band", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
      t("join, pre-distinct (count)") { joined.count() }
      t("full candidates (distinct)") { joined.distinct().count() }
    }
    spark.stop()
  }
}
