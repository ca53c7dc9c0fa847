package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{AqpAggType, BootstrapAggregate, ClosedFormAggregate, HacBehavior, Weightage}

/**
 * Public column-function surface of the engine (DataFrame API counterpart of
 * reference `org.apache.spark.sql.aqp.functions` — `sql/aqp/functions.scala`).
 */
object functions {

  /** Name of the hidden packed-weight column carried by stratified samples. */
  val weightColumn: String = Weightage.WeightColumn

  /** Decoded Horvitz–Thompson weight (stratumTotal / keptRows) of a sample row. */
  def sample_weight(raw: Column): Column = Weightage.mapColumnToWeight(raw)
  def sample_weight: Column = sample_weight(col(weightColumn))

  // ---------------------------------------------------------------------------
  // Cheap weighted estimators without error tracking — semantics of the
  // reference's AQPSum / AQPAverage / AQPCount
  // (`execution/common/bypassErrorCalculations.scala:28-180`): plain
  // Horvitz–Thompson column algebra, fully codegen'd by Catalyst.
  // ---------------------------------------------------------------------------

  /** `sum(w·x)` over non-null x. */
  def weighted_sum(c: Column, w: Column): Column =
    sum(c * w)
  def weighted_sum(c: Column): Column = weighted_sum(c, sample_weight)

  /** `sum(w·x)/sum(w)` over non-null x. */
  def weighted_avg(c: Column, w: Column): Column =
    sum(c * w) / sum(when(c.isNotNull, w))
  def weighted_avg(c: Column): Column = weighted_avg(c, sample_weight)

  /** `sum(w)` over non-null x — estimated count of base-table rows. */
  def weighted_count(c: Column, w: Column): Column =
    coalesce(sum(when(c.isNotNull, w)), lit(0.0))
  def weighted_count(c: Column): Column = weighted_count(c, sample_weight)

  /**
   * Weighted percentile: the quantile analogue of the Horvitz–Thompson
   * estimators — each sampled row counts `round(w)` times, via Spark's
   * exact `percentile(col, p, frequency)`. On a full-fraction sample
   * (w ≡ 1) this is the exact percentile; on a real sample it estimates
   * the base-table quantile with each row standing in for its stratum
   * share (fractional weights round to the nearest integer frequency).
   * Beyond the reference surface — it routes quantiles to the base table.
   */
  def weighted_percentile(c: Column, p: Double, w: Column): Column = {
    import org.apache.spark.sql.graft.Exprs
    val freq = greatest(lit(1L), round(w, 0).cast("long"))
    Exprs.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.Percentile(
        Exprs.expression(c), Exprs.expression(lit(p)),
        Exprs.expression(freq)).toAggregateExpression())
  }
  def weighted_percentile(c: Column, p: Double): Column =
    weighted_percentile(c, p, sample_weight)

  // ---------------------------------------------------------------------------
  // Closed-form (CLT) error-tracked estimators. Each returns
  // struct(estimate, lower_bound, upper_bound, absolute_error,
  //        relative_error, sample_count);
  // the introspection functions below are plain field extractions.
  // ---------------------------------------------------------------------------

  def approx_sum(c: Column, w: Column, confidence: Double = 0.95,
      error: Double = 1.0, behavior: String = "do_nothing"): Column =
    ClosedFormAggregate(c, w, AqpAggType.Sum, confidence, error,
      HacBehavior.parse(behavior))

  def approx_avg(c: Column, w: Column, confidence: Double = 0.95,
      error: Double = 1.0, behavior: String = "do_nothing"): Column =
    ClosedFormAggregate(c, w, AqpAggType.Avg, confidence, error,
      HacBehavior.parse(behavior))

  def approx_count(c: Column, w: Column, confidence: Double = 0.95,
      error: Double = 1.0, behavior: String = "do_nothing"): Column =
    ClosedFormAggregate(c, w, AqpAggType.Count, confidence, error,
      HacBehavior.parse(behavior))

  // ---------------------------------------------------------------------------
  // Poisson-bootstrap estimators (trials parallel perturbed aggregates;
  // quantile confidence intervals). `seed` is a per-row long used to draw the
  // multiplicities deterministically — typically xxhash64 over the row.
  // ---------------------------------------------------------------------------

  def approx_sum_bootstrap(c: Column, w: Column, seed: Column,
      trials: Int = 100, confidence: Double = 0.95, error: Double = 1.0,
      behavior: String = "do_nothing"): Column =
    BootstrapAggregate(c, w, seed, AqpAggType.Sum, trials, confidence, error,
      HacBehavior.parse(behavior))

  def approx_avg_bootstrap(c: Column, w: Column, seed: Column,
      trials: Int = 100, confidence: Double = 0.95, error: Double = 1.0,
      behavior: String = "do_nothing"): Column =
    BootstrapAggregate(c, w, seed, AqpAggType.Avg, trials, confidence, error,
      HacBehavior.parse(behavior))

  def approx_count_bootstrap(c: Column, w: Column, seed: Column,
      trials: Int = 100, confidence: Double = 0.95, error: Double = 1.0,
      behavior: String = "do_nothing"): Column =
    BootstrapAggregate(c, w, seed, AqpAggType.Count, trials, confidence, error,
      HacBehavior.parse(behavior))

  /** Point estimate of an error-tracked aggregate. */
  def estimate(c: Column): Column = c.getField("estimate")

  /** Half-width of the confidence interval
   * (reference `execution/common/errorEstimateFunctions.scala:48-84`). */
  def absolute_error(c: Column): Column = c.getField("absolute_error")

  /** absErr / estimate, clamped for |estimate| ≤ 1
   * (reference `errorEstimateFunctions.scala:85-121`). */
  def relative_error(c: Column): Column = c.getField("relative_error")

  def lower_bound(c: Column): Column = c.getField("lower_bound")
  def upper_bound(c: Column): Column = c.getField("upper_bound")
}
