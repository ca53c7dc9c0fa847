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
 * When the whole input is small enough that AQE would broadcast the join
 * anyway (local testing, small corpora), the forced shuffle is pure
 * overhead — the fingerprints are cheap at that size even computed once per
 * side — so the hint is dropped and the optimizer picks the plan. The
 * decision reads the optimizer's size ESTIMATE of the un-exploded input
 * (each exploded side is a constant small factor of it in narrow rows), so
 * no query stages execute at planning time.
 *
 * `spark.graft.candidateJoin.shuffleHash` overrides: `on` always hints
 * (the at-scale plan pins set this), `off` never hints, `auto` (default)
 * applies the size rule against `spark.sql.autoBroadcastJoinThreshold`.
 */
object CandidateJoin {

  def maybeShuffleHash(input: DataFrame)(side: DataFrame): DataFrame = {
    val spark = input.sparkSession
    spark.conf.get("spark.graft.candidateJoin.shuffleHash", "auto") match {
      case "on" => side.hint("shuffle_hash")
      case "off" => side
      case _ =>
        val threshold = spark.sessionState.conf.autoBroadcastJoinThreshold
        val bytes = input.queryExecution.optimizedPlan.stats.sizeInBytes
        if (threshold > 0 && bytes <= BigInt(threshold)) side
        else side.hint("shuffle_hash")
    }
  }
}
