package org.apache.spark.sql.graft

import java.nio.ByteBuffer
import java.util.SplittableRandom

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.types._

/**
 * Poisson-bootstrap approximate aggregate over a stratified sample
 * (reference `execution/bootstrap/` — `BootstrapSum.scala:33-94`,
 * `BootstrapCount.scala`, `BootstrapAverage.scala`,
 * `BootstrapMultiplicityAggregate.scala`, finalizer
 * `BootstrapFunctions.scala:143-216`).
 *
 * Each row contributes to `trials + 1` parallel weighted aggregates: trial 0
 * with multiplicity 1 (the unperturbed Horvitz–Thompson estimate), trials
 * 1..T with i.i.d. Poisson(1) multiplicities drawn from a per-row
 * deterministic stream seeded by the `seed` child (content hash), making
 * results reproducible for a fixed sample + seed — the reference gets
 * determinism by pinning partition layout + `DebugFixedSeed`
 * (`hive/sampleOperators.scala:47-135`).
 *
 * Buffer: `valsum[T+1] ++ wcnt[T+1] ++ [rowCount]` where per trial i
 * `valsum[i] = Σ w·x·m_i`, `wcnt[i] = Σ w·m_i`.
 *
 * Finalize (reference `evalApproxColumn`): trial values (Sum → valsum,
 * Count → wcnt, Avg → valsum/wcnt) restricted to trials with ≥1 sampled row
 * (`wcnt > 0`); estimate = trial 0; CI = [sorted(⌊n·lo⌋), sorted(⌈n·hi⌉−1)];
 * absErr = (ub−lb)/2; relErr = |(ub−lb)/(2·safeEstimate)| with the ±1 clamp
 * for |estimate| ≤ 1; LOCAL_OMIT → all-NULL when relErr > error.
 *
 * Returns the same result struct as [[ClosedFormAggregate]] so the
 * error-introspection functions bind identically.
 */
case class BootstrapAggregate(
    child: Expression,
    weight: Expression,
    seed: Expression,
    aggType: AqpAggType.AqpAggType,
    trials: Int,
    confidence: Double,
    error: Double,
    behavior: HacBehavior.HacBehavior,
    fixedPoisson: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  private lazy val valueExpr: Expression =
    if (aggType == AqpAggType.Count) child else Cast(child, DoubleType)

  private val n1 = trials + 1

  override def children: Seq[Expression] = child :: weight :: seed :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = ClosedFormAggregate.resultType

  override def createAggregationBuffer(): Array[Double] = new Array[Double](2 * n1 + 1)

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = valueExpr.eval(input)
    if (v != null) {
      val x = if (aggType == AqpAggType.Count) 1.0 else v.asInstanceOf[Double]
      if (!x.isNaN) {
        val wRaw = weight.eval(input)
        val w =
          if (wRaw == null) 1.0
          else Weightage.decode(wRaw.asInstanceOf[Long])
        val s = seed.eval(input)
        val rng = new SplittableRandom(if (s == null) 42L else s.asInstanceOf[Long])
        buffer(0) += w * x
        buffer(n1) += w
        var i = 1
        while (i < n1) {
          // spark.sql.aqp.debug.poisson=fixed pins every multiplicity to 1
          // (reference `AQPDebugPoissonType` — debug-only: every trial then
          // equals the unperturbed estimate, so the CI collapses to a point)
          val m = if (fixedPoisson) 1 else BootstrapAggregate.poisson1(rng)
          if (m > 0) {
            buffer(i) += w * x * m
            buffer(n1 + i) += w * m
          }
          i += 1
        }
        buffer(2 * n1) += 1.0
      }
    }
    buffer
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Double]): Any = {
    val nRows = buffer(2 * n1).toLong
    if (nRows == 0L) {
      if (aggType == AqpAggType.Count) {
        ClosedFormAggregate.result(0.0, null, null, null, null, 0L)
      } else null
    } else {
      def trialValue(i: Int): Double = aggType match {
        case AqpAggType.Sum => buffer(i)
        case AqpAggType.Count => buffer(n1 + i)
        case AqpAggType.Avg =>
          if (buffer(n1 + i) == 0.0) Double.NaN else buffer(i) / buffer(n1 + i)
      }
      val estimate = trialValue(0)
      val values = (0 until n1).iterator
        .filter(i => buffer(n1 + i) > 0.0)
        .map(trialValue)
        .filter(v => !v.isNaN)
        .toArray
      if (values.isEmpty || estimate.isNaN) {
        if (aggType == AqpAggType.Count) {
          ClosedFormAggregate.result(0.0, null, null, null, null, nRows)
        } else null
      } else {
        java.util.Arrays.sort(values)
        val lowerQ = (1.0 - confidence) / 2.0
        val upperQ = 1.0 - lowerQ
        val n = values.length
        val lb = values(math.min(n - 1, math.floor(n * lowerQ).toInt))
        val ub = values(math.max(0, math.ceil(n * upperQ).toInt - 1))
        val absErr = (ub - lb) / 2.0
        val safeEstimate =
          if (estimate < -1 || estimate > 1) estimate
          else if (estimate >= 0) estimate + 1
          else estimate - 1
        val relErr = math.abs((ub - lb) / (2.0 * safeEstimate))
        if (behavior == HacBehavior.LocalOmit && relErr > error) {
          ClosedFormAggregate.result(null, null, null, null, null, nRows)
        } else {
          ClosedFormAggregate.result(estimate, lb, ub, absErr, relErr, nRows)
        }
      }
    }
  }

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BootstrapAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BootstrapAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BootstrapAggregate =
    copy(child = newChildren(0), weight = newChildren(1), seed = newChildren(2))

  override def prettyName: String = aggType match {
    case AqpAggType.Sum => "approx_sum_bs"
    case AqpAggType.Avg => "approx_avg_bs"
    case AqpAggType.Count => "approx_count_bs"
  }
}

object BootstrapAggregate {
  /** Knuth's Poisson(1) sampler: deterministic given the rng state. */
  private final val L = math.exp(-1.0)
  def poisson1(rng: SplittableRandom): Int = {
    var k = 0
    var p = 1.0
    while ({ p *= rng.nextDouble(); p > L }) k += 1
    k
  }

  def apply(c: Column, rawWeight: Column, seed: Column,
      aggType: AqpAggType.AqpAggType, trials: Int, confidence: Double,
      error: Double, behavior: HacBehavior.HacBehavior): Column =
    apply(c, rawWeight, seed, aggType, trials, confidence, error, behavior,
      fixedPoisson = false)

  def apply(c: Column, rawWeight: Column, seed: Column,
      aggType: AqpAggType.AqpAggType, trials: Int, confidence: Double,
      error: Double, behavior: HacBehavior.HacBehavior,
      fixedPoisson: Boolean): Column =
    Exprs.column(new BootstrapAggregate(
      Exprs.expression(c), Exprs.expression(rawWeight), Exprs.expression(seed),
      aggType, trials, confidence, error, behavior,
      fixedPoisson).toAggregateExpression())
}
