package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Occupancy-capped degradation of banding buckets to sorted id-neighbor
 * chains — the skew guard for BOTH candidate-pair operators (MinHash doc
 * dedup, [[graft.dedup.Dedup]]; hyperplane-banded embedding dedup,
 * [[graft.ann.Ann.cosineDedupPairs]]).
 *
 * Why it exists: a single hot bucket — 10⁵ near-identical boilerplate
 * docs (or their embeddings) in a web crawl — makes the bucket self-join
 * emit `occ²/2` rows PER BAND into one task's distinct (10⁵ → ~8×10¹⁰
 * pre-distinct rows at 16 bands, ~80 GB of distinct spill: a disk wall
 * the per-id verify cap cannot prevent, because the cap runs AFTER the
 * distinct — and one the ADC bound cannot cut either, because identical
 * vectors PASS the bound). Over-cap buckets instead emit a sorted
 * id-neighbor CHAIN (each member linked to its next [[ChainLinks]]
 * id-successors): candidate volume `occ × links` (linear), and every
 * TRUE duplicate cluster still collapses to one connected component —
 * each consecutive-id link verifies equal (docs) / at cosine 1 ≥ any
 * threshold (embeddings), so [[graft.dedup.Dedup.connectedComponents]]
 * walks the chain. The trade, stated plainly: PAIR-level recall inside
 * an over-cap bucket drops to the chain (a merely-similar — not
 * identical — hot cluster reports its neighbor pairs, not all occ²/2);
 * buckets at or under the cap are untouched.
 *
 * OFF by default: engaging it costs an extra occupancy-profile pass
 * over the banded frame (deliberately never cached), and every healthy
 * corpus the gates measure has bounded occupancy by construction (the
 * auto-sized banding targets ~4 random members per bucket). It is the
 * knob for boilerplate-heavy crawls, not a tax on everyone.
 */
object HotBuckets {
  /** Conf key: band buckets with MORE than this many members degrade to
   * the neighbor chain. `0` (default) = off. */
  val ConfKey = "spark.graft.dedup.maxBucketOccupancy"

  /** Neighbor links emitted per member of an over-cap bucket — enough
   * chain redundancy to survive a few verify-rejected links while
   * keeping the hot-bucket candidate term linear. Connectivity of a
   * TRUE duplicate clique needs only the consecutive-id link (every
   * such link verifies), so any value ≥ 1 preserves cluster collapse. */
  val ChainLinks = 4

  def cap(df: DataFrame): Int =
    df.sparkSession.conf.get(ConfKey, "0").toInt

  /** Splits a banded frame into (cold rows, hot-bucket chain pairs).
   *
   * `cold` keeps the banded schema minus nothing — feed it to the
   * existing bucket self-join unchanged (over-cap keys are FEW by
   * definition — each holds > cap members, so ≤ n·bands/cap keys:
   * they broadcast, and the cold path stays the exact stage-reuse join
   * shape with only a map-side anti filter added). `hotPairs` has
   * columns `id_a`, `id_b` plus `${p}_a`/`${p}_b` for every payload
   * column `p` (e.g. the ADC stats struct), produced by ONE window
   * sort of occ rows per bucket — trivially single-task even at 10⁵.
   * Pairs already satisfy `id_a < id_b` (chain follows ascending ids). */
  def chainSplit(banded: DataFrame, keyCols: Seq[String], idCol: String,
      payload: Seq[String], occCap: Int): (DataFrame, DataFrame) = {
    require(occCap > 0, s"chainSplit needs a positive cap: $occCap")
    val keys = keyCols.map(col)
    val hot = banded.groupBy(keys: _*)
      .agg(count(lit(1)).as("__graft_occ__"))
      .filter(col("__graft_occ__") > occCap)
      .select(keys: _*)
    val cold = banded.join(broadcast(hot), keyCols, "left_anti")
    val w = Window.partitionBy(keys: _*).orderBy(col(idCol))
    val nbr = struct((idCol +: payload).map(col): _*)
    val leads = (1 to ChainLinks).map(j => lead(nbr, j).over(w))
    // the window array and the explode must live in SEPARATE selects —
    // a window expression is not legal inside a generator's argument
    val stage1 = Seq(col(idCol).as("id_a")) ++
      payload.map(p => col(p).as(s"${p}_a")) ++
      Seq(array(leads: _*).as("__graft_nbrs__"))
    val stage2 = Seq(col("id_a")) ++ payload.map(p => col(s"${p}_a")) ++
      Seq(explode(col("__graft_nbrs__")).as("__graft_nbr__"))
    val stage3 = Seq(col("id_a")) ++ payload.map(p => col(s"${p}_a")) ++
      Seq(col(s"__graft_nbr__.$idCol").as("id_b")) ++
      payload.map(p => col(s"__graft_nbr__.$p").as(s"${p}_b"))
    val hotPairs = banded
      .join(broadcast(hot), keyCols, "left_semi")
      .select(stage1: _*)
      .select(stage2: _*)
      .filter(col("__graft_nbr__").isNotNull)
      .select(stage3: _*)
      // ids are unique per bucket under the input contract, but a
      // duplicate-id corpus must not emit self-pairs
      .filter(col("id_a") < col("id_b"))
    (cold, hotPairs)
  }
}
