package graft.core

import org.apache.spark.sql.DataFrame

/**
 * Join-strategy policy for the bucket self-joins of the candidate-pair
 * operators (LSH bands, SimHash chunks, hyperplane buckets).
 *
 * At corpus scale both sides are hinted `shuffle_hash`: the two sides'
 * narrow (bucket, id) exchanges canonicalize identically, so exchange/stage
 * reuse computes the expensive fingerprint/signature column ONCE in the
 * shared shuffle map stage — the no-persist replacement for an
 * operator-internal cache (which would leak storage past the query).
 *
 * The hint applies only inside a SIZE WINDOW, both edges measured:
 *
 *  - BELOW `spark.sql.autoBroadcastJoinThreshold`, AQE would broadcast the
 *    join anyway (local testing, small corpora) and the forced shuffle is
 *    pure overhead — the hint is dropped and the optimizer picks the plan.
 *  - ABOVE `spark.graft.candidateJoin.shuffleHashMaxBytes` (default 64 MB
 *    of estimated un-exploded input), the hint is dropped so the planner
 *    takes SORT-MERGE: a shuffled-hash join's build side CANNOT SPILL, and
 *    per-partition build maps grow linearly with the corpus. Measured at
 *    the r14 third-decade point: the pinned shuffle-hash shape OOM'd at 5M
 *    docs ("not enough memory to build hash map" — 80M banded rows over 32
 *    partitions, ~200 MB of hash map per task × 32 concurrent tasks in an
 *    8 GB heap) where the same query at 500k docs (estimate 17.6 MB) ran
 *    comfortably. Sort-merge spills and finishes; with both sides'
 *    exchanges still canonicalizing identically, stage reuse survives — the
 *    sorts are the only added cost. The 64 MB default sits ~4× above the
 *    largest measured-safe point and ~3× below the measured death, and
 *    leaves per-task builds ~25 MB raw at default partitioning — inside a
 *    1 GB-task executor's execution share on a real cluster.
 *
 * The decision reads the optimizer's size ESTIMATE of the un-exploded
 * input (each exploded side is a constant small factor of it in narrow
 * rows), so no query stages execute at planning time.
 *
 * `spark.graft.candidateJoin.shuffleHash` overrides: `on` always hints
 * (the at-scale plan pins set this; they measure the shape, not memory),
 * `off` never hints, `auto` (default) applies the size window.
 */
object CandidateJoin {

  def maybeShuffleHash(input: DataFrame)(side: DataFrame): DataFrame = {
    val spark = input.sparkSession
    spark.conf.get("spark.graft.candidateJoin.shuffleHash", "auto") match {
      case "on" => side.hint("shuffle_hash")
      case "off" => side
      case _ =>
        val threshold = spark.sessionState.conf.autoBroadcastJoinThreshold
        val maxBytes = BigInt(spark.conf.get(
          "spark.graft.candidateJoin.shuffleHashMaxBytes",
          (64L << 20).toString).toLong)
        val bytes = input.queryExecution.optimizedPlan.stats.sizeInBytes
        if (threshold > 0 && bytes <= BigInt(threshold)) side
        else if (bytes > maxBytes) {
          org.slf4j.LoggerFactory.getLogger(CandidateJoin.getClass).info(
            s"candidate join: input estimate $bytes B exceeds " +
              s"shuffleHashMaxBytes $maxBytes B — leaving the plan to " +
              "sort-merge (a shuffled-hash build side cannot spill at " +
              "this size)")
          side
        } else side.hint("shuffle_hash")
    }
  }
}
