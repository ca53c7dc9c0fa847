package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builds a COMPLETE scaled bench dir (`/tmp/sf1u`, `/tmp/sf10u`, ...)
 * runnable by `graft.Bench` via SPARK_GRAFT_SF_DIR — the full recipe the
 * BENCH_sf1 addenda describe in prose, committed so a fresh box can
 * regenerate the decade points instead of reconstructing them by hand:
 *
 *  - dimension tables (`region nation customer supplier part orders`)
 *    copied 1x — replicating both join sides would square join output and
 *    measure the NEXT decade's join work, not this one's;
 *  - fact tables (`lineitem events`) replicated plain (no id semantics in
 *    the gates that scan them) as CONTIGUOUS COPIES — a union of k
 *    unrepartitioned reads, so every output file holds one replica's rows
 *    in source order. A first cut interleaved the replicas
 *    (crossJoin + repartition(32)) and paid 26–30% on scan-bound gates
 *    (q02 21.7 → 16.1 s, q17 11.7 → 8.2 s at 100×): round-robin row order
 *    wrecks per-file dictionary/RLE encoding and collapses the scan to 32
 *    coarse tasks. Layout is part of the corpus recipe;
 *  - `documents` substitution-ciphered per replica (ScaleDocsGen — unique
 *    character shingles across replicas, so dedup candidate growth
 *    measures the operator, not corpus construction);
 *  - `embeddings` circularly rolled + sign-flipped per replica
 *    (ScaleEmbGen — cosine-preserving within a replica, decorrelated
 *    across replicas).
 *
 * Usage: Test/runMain graft.perf.ScaleDirGen <out> [replicas] [srcDir]
 * e.g. `/tmp/sf1u 10` or `/tmp/sf10u 100`.
 */
object ScaleDirGen {
  private val dims = Seq("region", "nation", "customer", "supplier",
    "part", "orders")
  private val plainFacts = Seq("lineitem", "events")

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/sf1u")
    val replicas = if (args.length > 1) args(1).toInt else 10
    val src = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dims.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"GEN $out/$t: 1x copy")
    }
    plainFacts.foreach { t =>
      // one scan node over the source path listed `replicas` times: each
      // input split carries one replica's rows in source order, so output
      // files keep the source's encoding locality
      spark.read.parquet(Seq.fill(replicas)(s"$src/$t.parquet"): _*)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      // duplicate paths surviving read.parquet(path, path, ...) is
      // UNDOCUMENTED Spark behavior — if an upgrade ever dedups the list,
      // a silently 1x corpus would poison every decade measurement, so
      // the row count is asserted, not just printed
      val base = spark.read.parquet(s"$src/$t.parquet").count()
      val written = spark.read.parquet(s"$out/$t.parquet").count()
      require(written == base * replicas,
        s"$out/$t: wrote $written rows, expected $base x $replicas — " +
          "did read.parquet stop honoring duplicate paths?")
      println(s"GEN $out/$t: $written rows")
    }
    println(s"GEN $out/documents: " +
      s"${ScaleDocsGen.generate(spark, out, replicas, src)} docs")
    println(s"GEN $out/embeddings: " +
      s"${ScaleEmbGen.generate(spark, out, replicas, src)} vectors")
    spark.stop()
  }
}
