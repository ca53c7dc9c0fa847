package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the optimizer size estimate `CandidateJoin.maybeShuffleHash`
 * reads at each candidate-join call site (the minhash signature frame and
 * the raw doc frame), per corpus — the number the shuffle-hash upper cap
 * has to be calibrated against (r14: the pinned shuffle-hash join OOM'd
 * at 5M docs — "not enough memory to build hash map" — because SHJ's
 * build side cannot spill; the cap routes oversized joins to sort-merge).
 *
 * Usage: Test/runMain graft.perf.CandidateJoinSizeProbe <sfDir>...
 */
object CandidateJoinSizeProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dirs.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val n = docs.count()
      val sig = docs.filter(col("text").isNotNull)
        .select(col("doc_id").as("id"),
          graft.dedup.Dedup.minhashSignature(col("text")).as("sig"))
      def est(df: org.apache.spark.sql.DataFrame): BigInt =
        df.queryExecution.optimizedPlan.stats.sizeInBytes
      println(f"SIZEPROBE $dir docs=$n docsEst=${est(docs)} " +
        f"sigEst=${est(sig)}")
    }
    spark.stop()
  }
}
