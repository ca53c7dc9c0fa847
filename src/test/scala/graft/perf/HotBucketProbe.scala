package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adversarial-skew corpus for the candidate-join policy (r15 verdict
 * next-round #8): every measured corpus so far has benign bucket
 * occupancy (max duplicate class 2 at 50M docs), so this probe PLANTS
 * the web-crawl pathology — one boilerplate page repeated `hot` times —
 * on top of a unique-content base corpus ([[ScaleDocsGen]] replicas),
 * and measures the banding join on it.
 *
 * The arithmetic being pinned: `hot` identical docs share every band
 * bucket, so the bucket self-join emits `bands · hot²/2` pre-distinct
 * rows and the distinct must absorb `hot²/2` unique pairs — 10⁵ hot
 * docs ⇒ 8×10¹⁰ joined rows and ~80 GB of distinct state: a disk wall
 * no per-id verify cap can prevent (the cap runs after the distinct).
 * `spark.graft.dedup.maxBucketOccupancy` degrades over-cap buckets to
 * sorted id-neighbor chains — linear volume, cluster connectivity
 * preserved (PipelineSpec pins the semantics; this probe pins the
 * scale).
 *
 * Usage: Test/runMain graft.perf.HotBucketProbe <mode> <hot> [replicas]
 *   mode = off   — knob off, candidate count + wall (use hot ≤ ~3e4:
 *                  the quadratic term is the measurement, not a hang)
 *          on    — knob on (cap 1024), candidate count + wall
 *          e2e   — knob on, full jaccardPairs + connectedComponents:
 *                  the planted cluster must collapse to ONE component
 *          emb-off / emb-on — the SAME pathology on the embedding
 *                  operator: `hot` copies of one vector planted on the
 *                  /tmp/emb2m corpus (the ADC bound cannot cut
 *                  identical vectors), full cosineDedupPairs wall +
 *                  pair count with the cap off / on (1024). With the
 *                  cap on the planted cluster must contribute chain
 *                  pairs (~4·hot), not hot²/2.
 *   replicas = base-corpus ScaleDocsGen replicas of sf0.1 (default 400
 *              ≈ 2M unique docs; ignored by emb modes)
 */
object HotBucketProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: HotBucketProbe <off|on|e2e> <hot> [replicas]")
    val mode = args(0)
    val hot = args(1).toInt
    val replicas = if (args.length > 2) args(2).toInt else 400
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    if (mode.startsWith("emb-")) {
      val base = spark.read.parquet("/tmp/emb2m/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val hotVec = base.filter(col("vec_id") === 0)
        .collect()(0).getSeq[Float](1)
      val hotBase = 100000000000L
      val hotDf = spark.range(hot)
        .select((col("id") + hotBase).as("vec_id"),
          typedLit(hotVec).as("embedding"))
      val df = base.unionByName(hotDf)
      if (mode == "emb-on") {
        spark.conf.set("spark.graft.dedup.maxBucketOccupancy", "1024")
      }
      val t0 = System.nanoTime()
      val pairs = graft.ann.Ann
        .cosineDedupPairs(df, "vec_id", "embedding", 0.99)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val nPairs = pairs.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val hotPairs = pairs
        .filter(col("id_a") >= hotBase && col("id_b") >= hotBase).count()
      pairs.unpersist()
      println(f"PROBE hot-bucket mode=$mode hot=$hot pairs=$nPairs " +
        f"hotPairs=$hotPairs wall=$wall%.1fs")
      spark.stop()
      return
    }
    val baseDir = s"/tmp/skewbase_$replicas"
    if (!new java.io.File(s"$baseDir/documents.parquet").exists()) {
      val n = ScaleDocsGen.generate(spark, baseDir, replicas,
        "/root/testdata/sf0.1")
      println(s"GEN $baseDir: $n base docs")
    }
    val boiler = (1 to 120).map(i => "boilerplate").zipWithIndex
      .map { case (w, i) => s"$w${i % 7}" }.mkString(" ")
    val base = spark.read.parquet(s"$baseDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // hot ids live far above any replica remap (+k*10^7 per ScaleDocsGen
    // replica, so 400 replicas reach 4x10^9) — a colliding id range would
    // plant duplicate keys and corrupt the cluster-collapse check
    val hotBase = 100000000000L
    val hotDf = spark.range(hot)
      .select((col("id") + hotBase).as("doc_id"), lit(boiler).as("text"))
    val df = base.unionByName(hotDf)
    if (mode == "on" || mode == "e2e") {
      spark.conf.set("spark.graft.dedup.maxBucketOccupancy", "1024")
    }
    val t0 = System.nanoTime()
    mode match {
      case "off" | "on" =>
        val cands = graft.dedup.Dedup
          .lshCandidatePairIds(df, "doc_id", "text").count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"PROBE hot-bucket mode=$mode hot=$hot replicas=$replicas " +
          f"candidates=$cands wall=$wall%.1fs")
      case "e2e" =>
        val pairs = graft.dedup.Dedup.jaccardPairs(df, "doc_id", "text",
          0.999999, n = 3).select(col("id_a"), col("id_b"))
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        val nPairs = pairs.count()
        val tPairs = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val cc = graft.dedup.Dedup.connectedComponents(pairs, df, "doc_id")
        val hotClusters = cc.filter(col("doc_id") >= 100000000000L)
          .select(col("cluster_id")).distinct().count()
        val tCc = (System.nanoTime() - t1) / 1e9
        pairs.unpersist()
        println(f"PROBE hot-bucket mode=e2e hot=$hot replicas=$replicas " +
          f"pairs=$nPairs tPairs=$tPairs%.1fs hotClusters=$hotClusters " +
          f"tCC=$tCc%.1fs " +
          (if (hotClusters == 1) "COLLAPSED" else "SPLIT"))
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
