package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe for the BENCH_sf1 auto-sizing note: times
 * `cosineDedupPairs` with the fixed band width (16 planes x 4 bands, the
 * pre-r13 default) against `numPlanes = 0` auto sizing (the r13 default)
 * on a scale corpus, and reports both pair counts (auto may only ever ADD
 * candidates at corpora below the clamp size — its width is ≤ the fixed
 * form's, so its recall dominates while bucket occupancy stays near the
 * target).
 *
 * Usage: Test/runMain graft.perf.AutoPlanesProbe <sfDir> [threshold] [passes]
 * (passes = 1 skips the warmup too — multi-minute corpora are
 * JIT-insensitive and a 4-pass default would run for an hour)
 */
object AutoPlanesProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = if (args.length > 1) args(1).toDouble else 0.99
    val passes = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    def timed(tag: String, numPlanes: Int): (Double, Long) = {
      // warmup + `passes` timed, median (passes = 1: single cold run)
      var pairs = 0L
      def once(): Double = {
        val t0 = System.nanoTime()
        pairs = graft.ann.Ann.cosineDedupPairs(emb, "vec_id", "embedding",
          threshold, numPlanes = numPlanes).count()
        (System.nanoTime() - t0) / 1e9
      }
      if (passes > 1) once()
      val ts = (1 to passes).map(_ => once()).sorted
      (ts(ts.size / 2), pairs)
    }
    val mode = if (args.length > 3) args(3) else "both"
    val explicitPb = "p(\\d+)b(\\d+)".r
    mode match {
      case "pairsonly" =>
        // candidate VOLUME at auto's chosen shape, without the vector
        // fetch: at 20M vectors the full operator's exact-cosine fetch
        // moves pairs x 2 x 256 B through one box's shuffle (> 67 GB
        // spilled, exceeding this box's disk; at 1000 executors the same
        // bytes are ~90 MB each, a non-event) — the structural claim worth
        // pinning here is that the candidate TERM stays linear, which the
        // distinct pair count measures without the fetch.
        val n = emb.filter(col("embedding").isNotNull).count()
        val (p, b) = graft.ann.Ann.autoLshParams(n, threshold, 4)
        val planes = graft.ann.Ann.hyperplanes(
          emb.select(size(col("embedding"))).head().getInt(0), p * b)
        val banded = emb.select(col("vec_id").as("id"),
          posexplode(org.apache.spark.sql.graft.HyperplaneBandBuckets(
            col("embedding"), planes, p)))
          .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
        val hint = graft.core.CandidateJoin.maybeShuffleHash(emb) _
        val t0 = System.nanoTime()
        val pairs = hint(banded.select(col("band"), col("bucket"),
            col("id").as("id_a")))
          .join(hint(banded.select(col("band"), col("bucket"),
            col("id").as("id_b"))), Seq("band", "bucket"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b")).distinct().count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"PROBE sf=$sfDir pairsonly n=$n p=$p b=$b " +
          f"pairs=$pairs wall=$wall%.2f s pairsPerVec=${pairs.toDouble / n}%.2f")
      case explicitPb(p, b) =>
        // arbitrary explicit shape, e.g. p19b5 — for occupancy-target
        // experiments without touching the operator
        var pairs = 0L
        def onceX(): Double = {
          val t0 = System.nanoTime()
          pairs = graft.ann.Ann.cosineDedupPairs(emb, "vec_id", "embedding",
            threshold, numPlanes = p.toInt, bands = b.toInt).count()
          (System.nanoTime() - t0) / 1e9
        }
        if (passes > 1) onceX()
        val ts = (1 to passes).map(_ => onceX()).sorted
        println(f"PROBE sf=$sfDir ${p}x$b=${ts(ts.size / 2)}%.2fs pairs=$pairs")
      case _ =>
        if (mode == "both" || mode == "default") {
          val (tDef, nDef) = timed("default", 16)
          println(f"PROBE sf=$sfDir default16x4=$tDef%.2fs pairs=$nDef")
        }
        if (mode == "both" || mode == "auto") {
          val (tAuto, nAuto) = timed("auto", 0)
          println(f"PROBE sf=$sfDir auto=$tAuto%.2fs pairs=$nAuto")
        }
    }
    spark.stop()
  }
}
