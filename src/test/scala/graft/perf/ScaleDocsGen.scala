package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Committed generator for the unique-content document scale corpora
 * (`/tmp/sf1u`..`/tmp/sf100u` decade points) — the recipe BENCH_sf1.md
 * documents, now executable instead of prose: per replica k, doc_ids
 * remapped (+k·10⁷) and text Caesar-rotated by k over letters AND digits,
 * so every CHARACTER shingle changes across replicas (corpus-hygiene
 * lesson: token PREFIXING was rejected — interior shingles survive inside
 * `r3xbatch` vs `r7xbatch` and cross-replica signature similarity stays
 * ~0.5, making candidate growth quadratic BY CORPUS CONSTRUCTION) while
 * within-replica structure stays byte-isomorphic to the source. Replica 0
 * is the UNROTATED original, so any planted structure in the source
 * survives verbatim.
 *
 * Usage: Test/runMain graft.perf.ScaleDocsGen <out> [replicas] [srcDir]
 * e.g. `/tmp/sf100u 1000 /root/testdata/sf0.1` = 5M docs.
 */
object ScaleDocsGen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/sf100u")
    val replicas = if (args.length > 1) args(1).toInt else 1000
    val src = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = generate(spark, out, replicas, src)
    println(s"GEN $out: $n docs")
    spark.stop()
  }

  /** Writes `$out/documents.parquet` (the Caesar-rotated unique-content
   * corpus) and returns the row count. Shared with ScaleDirGen. */
  def generate(spark: SparkSession, out: String, replicas: Int,
      src: String): Long = {
    val base = spark.read.parquet(s"$src/documents.parquet")
    val caesar = udf { (k: Int, s: String) =>
      if (s == null) null
      else {
        val kl = ((k % 26) + 26) % 26
        val kd = ((k % 10) + 10) % 10
        val b = new StringBuilder(s.length)
        s.foreach {
          case c if c >= 'a' && c <= 'z' =>
            b.append(('a' + (c - 'a' + kl) % 26).toChar)
          case c if c >= 'A' && c <= 'Z' =>
            b.append(('A' + (c - 'A' + kl) % 26).toChar)
          case c if c >= '0' && c <= '9' =>
            b.append(('0' + (c - '0' + kd) % 10).toChar)
          case c => b.append(c)
        }
        b.toString
      }
    }
    spark.range(replicas).select(col("id").cast("int").as("rep"))
      .crossJoin(broadcast(base))
      .select(
        (col("rep").cast("long") * lit(10000000L) + col("doc_id")).as("doc_id"),
        caesar(col("rep"), col("text")).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    spark.read.parquet(s"$out/documents.parquet").count()
  }
}
