package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{MinHashSignature, SimHash64}

/**
 * Deduplication operators for training-data pipelines, all expressed as
 * declarative Spark plans (one shuffle per stage, map-side combined, no
 * driver loops):
 *
 *  - exact: hash-groupBy on content
 *  - MinHash + LSH banding: shingle → signature → band → bucket join
 *  - SimHash: 64-bit fingerprint + Hamming-ball candidate join
 *  - n-gram Jaccard: exact verification metric (column algebra)
 *
 * Scale notes: candidate generation never materializes the O(n²) pair space;
 * pairs only form inside LSH/SimHash buckets. Signature computation is O(n)
 * per document (rolling hashes). At 100 TB both stages are embarrassingly
 * parallel; the bucket join shuffles once on the bucket key, and AQE's skew
 * handling splits hot buckets.
 */
object Dedup {

  /** Exact dedup: keep the row with the smallest `idCol` per distinct
   * `contentCol` value. Two-phase min-id + semi-join rather than a window
   * rank: the groupBy is map-side combined so a pathologically duplicated
   * value (one text repeated 10⁹ times at corpus scale) never concentrates
   * its rows on a single task the way `Window.partitionBy(hash)` would. */
  def exact(df: DataFrame, contentCol: String, idCol: String): DataFrame = {
    val keepers = df
      .groupBy(xxhash64(col(contentCol)).as("__graft_h__"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    df.join(keepers, Seq(idCol), "left_semi")
  }

  /** MinHash signature column (array<bigint>). */
  def minhashSignature(c: Column, numHashes: Int = 128, shingleK: Int = 5): Column =
    MinHashSignature(c, numHashes, shingleK)

  /**
   * LSH candidate pairs: band the signature (`bands` bands of
   * `numHashes/bands` rows), bucket-join on (band, bandHash), emit distinct
   * `(idA < idB)` pairs with the signature-estimated Jaccard.
   * No false negatives for identical content (equal signatures share every
   * bucket); collision probability for Jaccard j is `1-(1-j^r)^b` — the
   * default 16 bands × 8 rows puts the S-curve knee near j≈0.75, keeping
   * candidate volume low on corpora with high background similarity.
   */
  def lshCandidatePairs(
      df: DataFrame,
      idCol: String,
      contentCol: String,
      numHashes: Int = 128,
      bands: Int = 16,
      shingleK: Int = 5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    val src = graft.core.Fanout(df)
    // cache the signatures: the self-join below consumes them on both sides,
    // and signature computation (O(len) rolling hashes x numHashes updates)
    // dominates the stage — without the cache it runs twice
    val sig = src.select(col(idCol).as("id"),
      minhashSignature(col(contentCol), numHashes, shingleK).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val banded = sig.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rows + lit(1), lit(rows)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")

    val a = banded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / lit(numHashes.toDouble))
          .as("est_jaccard"))
      .distinct()
  }

  /** SimHash fingerprint column (bigint). */
  def simhash(c: Column): Column = SimHash64(c)

  /** SimHash near-dup pairs within `maxHamming` bits. Blocks on 4 16-bit
   * chunks (pigeonhole: any pair within Hamming ≤ 3 shares at least one
   * exact 16-bit chunk), so no O(n²) cross join. */
  def simhashPairs(df: DataFrame, idCol: String, contentCol: String,
      maxHamming: Int = 3): DataFrame = {
    // persist: the self-join consumes the fingerprints on both sides, and the
    // 64-bit weighted-token hash dominates the stage — don't compute it twice
    val fp = graft.core.Fanout(df)
      .select(col(idCol).as("id"), simhash(col(contentCol)).as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val chunked = fp.select(col("id"), col("fp"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("fp"), i * 16).bitwiseAND(lit(0xffffL))): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "ckey")
    val a = chunked.select(col("chunk"), col("ckey"), col("id").as("id_a"), col("fp").as("fp_a"))
    val b = chunked.select(col("chunk"), col("ckey"), col("id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, Seq("chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /**
   * Collapse duplicate pairs into clusters: connected components by
   * iterative minimum-label propagation. `pairs` holds undirected edges
   * (`id_a`, `id_b`); every id in `ids` gets a `cluster_id` = the smallest
   * id reachable from it (singletons map to themselves).
   *
   * Each iteration is one join + one map-side-combined min-aggregation
   * (shuffle ∝ edge count, not corpus size); iterations needed = cluster
   * diameter, which for dedup graphs (LSH cliques plus short near-dup
   * chains) is small. Early-stops when labels converge; if the cap is hit
   * without convergence the call THROWS (silently returning unconverged
   * labels would split one component into several cluster_ids). The label
   * frame is localCheckpoint'ed per round, so both lineage and plan depth
   * stay O(1) regardless of chain diameter.
   */
  def connectedComponents(pairs: DataFrame, ids: DataFrame, idCol: String,
      maxIterations: Int = 20): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // only nodes touching an edge can ever change label — iterate over that
    // (usually small) subgraph and left-join the untouched corpus back as
    // singletons at the end, so per-iteration shuffles scale with the
    // duplicate graph, not the corpus. Each round is materialized into an
    // RDD-backed frame: caching alone keeps the LOGICAL lineage, which
    // nests one join deeper per round and blows up planning beyond ~10
    // iterations — truncating it keeps plan depth O(1) at any chain
    // diameter, and each superseded round's storage is released explicitly
    // (only the final round stays cached for the result join).
    val spark = pairs.sparkSession
    def materialize(df: DataFrame): (DataFrame, () => Unit) =
      org.apache.spark.sql.graft.Plans.materialize(spark, df)
    var (labels, releaseLabels) = materialize(
      edges.select(col("src").as("id")).distinct()
        .withColumn("cluster_id", col("id")))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      // candidate label per node: min over its own label and neighbors'
      val fromNeighbors = edges
        .join(labels.withColumnRenamed("id", "src")
          .withColumnRenamed("cluster_id", "nl"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("nl")).as("nl"))
      val (next, releaseNext) = materialize(
        labels.join(fromNeighbors, Seq("id"), "left")
          .select(col("id"),
            least(col("cluster_id"), coalesce(col("nl"), col("cluster_id")))
              .as("cluster_id"),
            col("cluster_id").as("__old__")))
      // full count (not a take-1 probe): materializes every partition of
      // `next` into its cache before the previous round is released
      val changed = next.filter(col("cluster_id") =!= col("__old__")).count()
      releaseLabels()
      labels = next.select(col("id"), col("cluster_id"))
      releaseLabels = releaseNext
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    if (!converged) {
      // silently returning unconverged labels would split one connected
      // component into several cluster_ids — refuse instead: the caller can
      // raise maxIterations (rounds needed = cluster diameter)
      releaseLabels()
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIterations " +
          "iterations (duplicate-chain diameter exceeds the cap); " +
          "raise maxIterations")
    }
    ids.select(col(idCol))
      .join(labels.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
  }

  /** Word n-gram array of a text column (column algebra; no UDF). */
  def wordNgrams(c: Column, n: Int): Column = {
    val toks = split(lower(trim(c)), "\\s+")
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
  }

  /** Exact n-gram Jaccard similarity between two text columns. Compares the
   * single-pass 64-bit gram hashes ([[WordNgramHashes]]) rather than gram
   * strings: set algebra over longs, immune to the codegen blowup of the
   * string version, and exact up to 2⁻⁶⁴ hash collisions. */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column = {
    val ga = org.apache.spark.sql.graft.WordNgramHashes(a, n)
    val gb = org.apache.spark.sql.graft.WordNgramHashes(b, n)
    val inter = size(array_intersect(ga, gb)).cast("double")
    val union = size(array_union(ga, gb)).cast("double")
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }
}
