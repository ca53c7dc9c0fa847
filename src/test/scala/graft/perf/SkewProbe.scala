package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe for the BENCH_sf1 hot-bucket note: measures the LSH band
 * bucket profile and candidate volume of the boilerplate skew fixture
 * (PipelineFuzzSpec's adversarial case). */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rnd = new scala.util.Random(777001L)
    val boiler = (1 to 60).map(_ => "boilerplate" + rnd.nextInt(10)).mkString(" ")
    val nDocs = 400
    val base = (1L to nDocs.toLong).map(i => (i, s"$boiler unique tail $i"))
    val copies = base.take(20).map { case (i, t) => (i + 10000L, t) }
    val df = (base ++ copies).toDF("doc_id", "text").repartition(8)
    // band-bucket occupancy profile (mirrors Dedup.bandedPairIds's banding)
    val numHashes = 128; val bands = 16; val rows = numHashes / bands
    val sig = df.select(col("doc_id"),
      graft.dedup.Dedup.minhashSignature(col("text"), numHashes, 5).as("sig"))
    val banded = sig.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rows + lit(1), lit(rows)), b))))
    val occ = banded.groupBy(col("pos"), col("col")).count()
    val prof = occ.agg(max("count").as("mx"), avg("count").as("av"),
      count(lit(1)).as("buckets")).collect()(0)
    val cands = graft.dedup.Dedup
      .lshCandidatePairIds(df, "doc_id", "text").count()
    val capped = graft.dedup.Dedup.jaccardPairs(df, "doc_id", "text",
      0.999999, n = 3, maxPairsPerId = 8).count()
    println(s"PROBE docs=${420} maxBucket=${prof.getLong(0)} " +
      s"avgBucket=${prof.getDouble(1)} buckets=${prof.getLong(2)} " +
      s"uncappedCandidates=$cands cappedPairs=$capped")
    spark.stop()
  }
}
