package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Generator for the above-crossover embedding corpora the BENCH_sf1
 * auto-sizing notes measure (2M vectors = 1000 replicas of the sf0.1
 * embeddings). Per replica k: circular roll by k AND a per-replica
 * seeded random sign-flip pattern — each transform is cosine-preserving
 * WITHIN a replica (within-replica pair structure stays exact), and
 * jointly they decorrelate replicas. The sign flips are the load-bearing
 * half: rolls alone repeat mod dim=64, so replicas 64..99 would exactly
 * duplicate 0..35 and every cross-replica "pair" found would be an
 * aliasing artifact (the r11 corpus lesson recorded in BENCH_sf1).
 *
 * Usage: Test/runMain graft.perf.ScaleEmbGen <outDir> [replicas] [srcSfDir]
 */
object ScaleEmbGen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/emb2m")
    val replicas = if (args.length > 1) args(1).toInt else 1000
    val src = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = generate(spark, out, replicas, src)
    println(s"GEN $out: $n vectors")
    spark.stop()
  }

  /** Writes `$out/embeddings.parquet` (roll + sign-flip decorrelated
   * replicas) and returns the row count. Non-vector columns (e.g.
   * `label`) are carried through plain so the output is a drop-in
   * replacement for the source table in a full bench dir. Shared with
   * ScaleDirGen. */
  def generate(spark: SparkSession, out: String, replicas: Int,
      src: String): Long = {
    val base = spark.read.parquet(s"$src/embeddings.parquet")
    val others = base.columns.filter(c => c != "vec_id" && c != "embedding")
    val transform = udf { (rep: Long, v: Seq[Float]) =>
      val dim = v.length
      val roll = (rep % dim).toInt
      val rnd = new scala.util.Random(0xC0FFEEL ^ (rep * 0x9E3779B97F4A7C15L))
      val signs = Array.fill(dim)(if (rnd.nextBoolean()) 1.0f else -1.0f)
      Array.tabulate(dim)(i => v((i + roll) % dim) * signs(i))
    }
    spark.range(replicas).select(col("id").as("rep"))
      .crossJoin(broadcast(base))
      .select(Seq(
        (col("rep") * lit(10000000L) + col("vec_id")).as("vec_id"),
        transform(col("rep"), col("embedding")).as("embedding")) ++
        others.map(col): _*)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    spark.read.parquet(s"$out/embeddings.parquet").count()
  }
}
