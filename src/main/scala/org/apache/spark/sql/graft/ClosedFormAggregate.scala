package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.commons.math3.distribution.{NormalDistribution, TDistribution}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, GenericInternalRow}
import org.apache.spark.sql.types._

/** Aggregate kind for closed-form (CLT) error estimation. */
object AqpAggType extends Enumeration {
  type AqpAggType = Value
  val Sum, Avg, Count = Value
}

/** HAC behaviors that act inside the aggregate finalizer. The remaining
 * behaviors (STRICT / RUN_ON_FULL_TABLE / PARTIAL_RUN_ON_BASE_TABLE) are
 * driver post-passes — see [[graft.aqp.Hac]]. Enum values mirror reference
 * `execution/common/QueryProcessingRules.scala:50-111`. */
object HacBehavior extends Enumeration {
  type HacBehavior = Value
  val DoNothing, LocalOmit, Strict, RerouteToBase, PartialRouting = Value

  def parse(s: String): HacBehavior = s.trim.toLowerCase match {
    case "do_nothing" => DoNothing
    case "local_omit" => LocalOmit
    case "strict" => Strict
    case "run_on_full_table" => RerouteToBase
    case "partial_run_on_base_table" => PartialRouting
    case x => throw new IllegalArgumentException(
      s"Unknown HAC behavior '$x'. Valid: do_nothing local_omit strict " +
        "run_on_full_table partial_run_on_base_table")
  }
}

/** Per-stratum running state: n values, Σv, Σv². */
private[graft] final class StratumStats(
    var n: Long = 0L, var sum: Double = 0.0, var sumSq: Double = 0.0) {
  def add(v: Double): Unit = { n += 1; sum += v; sumSq += v * v }
  def merge(o: StratumStats): Unit = { n += o.n; sum += o.sum; sumSq += o.sumSq }
}

/** Aggregation buffer: per-stratum stats keyed by the raw packed weight
 * (numSamples/stratumTotal/keyHash — [[Weightage]]). Keying by the raw
 * weight reproduces the reference's stratum bookkeeping
 * (`closedform/StatCounterAggregator.scala:44-55`) without requiring
 * stratum-clustered input order. */
private[graft] final class ClosedFormBuffer {
  val strata: mutable.LongMap[StratumStats] = mutable.LongMap.empty

  /** Input rows seen, INCLUDING rows whose aggregated value is NULL —
   * distinguishes a truly empty group (reference: zero errors) from an
   * all-NULL aggregate column over real rows (reference SNAP-823: NULL
   * error stats, because no variance is estimable). */
  var rows: Long = 0L

  // single-entry memo: input is usually clustered by stratum (the reference
  // exploits full sortedness — `closedFormError.scala:406-455`; we only
  // memoize the last stratum, which is order-insensitive-safe)
  private var lastKey: Long = -1L
  private var lastStats: StratumStats = _

  def add(rawWeight: Long, v: Double): Unit = {
    if (lastStats == null || rawWeight != lastKey) {
      lastStats = strata.getOrNull(rawWeight)
      if (lastStats == null) {
        lastStats = new StratumStats()
        strata.update(rawWeight, lastStats)
      }
      lastKey = rawWeight
    }
    lastStats.add(v)
  }

  def merge(o: ClosedFormBuffer): Unit = {
    rows += o.rows
    o.strata.foreach { case (k, s) =>
      strata.getOrElseUpdate(k, new StratumStats()).merge(s)
    }
  }
}

/**
 * Closed-form (CLT) approximate aggregate over a stratified sample.
 *
 * Returns `struct(estimate, lower_bound, upper_bound, absolute_error,
 * relative_error, sample_count)`. Error-introspection functions are plain
 * `getField` projections over this struct — the reference needed a custom
 * aggregate exec + hidden columns for the same
 * (`QueryProcessingRules.scala:2124-2352`); a struct-returning
 * `TypedImperativeAggregate` collapses all of that.
 *
 * Math follows reference `execution/closedform/closedFormError.scala:96-206`
 * (finalize), `errorEstimates.scala:212-262` (per-stratum variance),
 * `StatCounterAggregator.scala:44-55` (stratum close):
 *
 *  - per stratum s with L = sampled rows, R = stratum population,
 *    w = R/L, and aggregated values v (n_s values, Σv, Σv²):
 *      weightedCount += n_s·w ;  trueSum += Σv·w
 *      mulFactor = R·(R−L)/(L−1)
 *      Sum/Avg: strataVar = Σv²/L − (Σv/L)²     (conditional-sum variance:
 *               rows of the stratum filtered out of the query contribute 0)
 *      Count:   strataVar = (n_s/L)·(1 − n_s/L)
 *      nvariance += max(0, mulFactor · strataVar)   (NaN/negative → 0)
 *  - estimate: Count → weightedCount; Sum → trueSum; Avg → trueSum/weightedCount
 *  - stdDev: Sum/Count → √nvariance; Avg → √nvariance / weightedCount
 *  - bound = stdDev · (z at n≥30, else Student-t(n−1)) at `confidence`
 *  - relative error = |bound/est|, clamped to |bound/(|est|+1)| for |est|≤1
 *  - behavior LOCAL_OMIT: relError > error → NULL row fields
 */
case class ClosedFormAggregate(
    child: Expression,
    weight: Expression,
    aggType: AqpAggType.AqpAggType,
    confidence: Double,
    error: Double,
    behavior: HacBehavior.HacBehavior,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ClosedFormBuffer] {

  // fast path: skip the Cast wrapper when the child is already a double
  // (the hot interpreted update path runs per input row)
  private lazy val childIsDouble = child.dataType == DoubleType
  private lazy val valueExpr: Expression =
    if (aggType == AqpAggType.Count || childIsDouble) child
    else Cast(child, DoubleType)

  override def children: Seq[Expression] = child :: weight :: Nil
  override def nullable: Boolean = true

  override def dataType: DataType = ClosedFormAggregate.resultType

  override def createAggregationBuffer(): ClosedFormBuffer = new ClosedFormBuffer

  override def update(buffer: ClosedFormBuffer, input: InternalRow): ClosedFormBuffer = {
    buffer.rows += 1
    val v = valueExpr.eval(input)
    if (v != null) {
      val w = weight.eval(input)
      val raw = if (w == null) 0L else w.asInstanceOf[Long]
      val value =
        if (aggType == AqpAggType.Count) 1.0
        else v.asInstanceOf[Double]
      if (!value.isNaN) buffer.add(raw, value)
    }
    buffer
  }

  override def merge(buffer: ClosedFormBuffer, other: ClosedFormBuffer): ClosedFormBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: ClosedFormBuffer): Any = {
    var weightedCount = 0.0
    var trueSum = 0.0
    var nvariance = 0.0
    var totalN = 0L

    buffer.strata.foreach { case (raw, s) =>
      val l = Weightage.numSamples(raw)
      val r = Weightage.stratumTotal(raw)
      val (lw, rw, w) =
        if (raw == 0L || l == 0L) (0.0, 0.0, 1.0)
        else (l.toDouble, r.toDouble, r.toDouble / l.toDouble)
      weightedCount += s.n * w
      trueSum += s.sum * w
      totalN += s.n
      if (lw != 0.0) {
        val mulFactor = rw * (rw - lw) / (lw - 1.0)
        val strataVar = aggType match {
          case AqpAggType.Count =>
            (s.n / lw) * (1.0 - s.n / lw)
          case _ =>
            val cfMean = s.sum / lw
            s.sumSq / lw - cfMean * cfMean
        }
        val cfVar = mulFactor * strataVar
        if (!cfVar.isNaN && cfVar >= 0.0) nvariance += cfVar
      }
    }

    if (totalN == 0L) {
      // Count → 0 with no error info. Sum/Avg: a truly EMPTY group yields a
      // NULL struct (the error-function extractors read zero errors off it —
      // the reference's empty-table shape), while an all-NULL aggregate
      // column over REAL rows yields a non-null struct of NULL fields (NULL
      // error stats — reference SNAP-823: no variance is estimable)
      if (aggType == AqpAggType.Count) {
        ClosedFormAggregate.result(0.0, null, null, null, null, 0L)
      } else if (buffer.rows == 0L) {
        null
      } else {
        ClosedFormAggregate.result(null, null, null, null, null, 0L)
      }
    } else {
      val pointEstimate = aggType match {
        case AqpAggType.Count => weightedCount
        case AqpAggType.Sum => trueSum
        case AqpAggType.Avg => trueSum / weightedCount
      }
      var stdDev = aggType match {
        case AqpAggType.Avg => math.sqrt(nvariance / (weightedCount * weightedCount))
        case _ => math.sqrt(nvariance)
      }
      if (pointEstimate.isNaN) stdDev = Double.NaN
      else if (pointEstimate == 0.0 && aggType == AqpAggType.Count) stdDev = Double.NaN

      // z for n ≥ 30 else Student-t(n−1) — reference closedFormError.scala:129-138
      val confFactor =
        if (totalN >= 30) ClosedFormAggregate.zFactor(confidence)
        else new TDistribution(math.max(1.0, (totalN - 1).toDouble))
          .inverseCumulativeProbability(0.5 + confidence / 2.0)
      val bound = stdDev * confFactor

      val relError =
        if (pointEstimate < -1 || pointEstimate > 1) math.abs(bound / pointEstimate)
        else math.abs(bound / (math.abs(pointEstimate) + 1))

      if (behavior == HacBehavior.LocalOmit && relError > error) {
        // omitted group: NULL everything except a Count point-estimate marker
        if (aggType == AqpAggType.Count) {
          ClosedFormAggregate.result(-1.0, null, null, null, null, totalN)
        } else {
          ClosedFormAggregate.result(null, null, null, null, null, totalN)
        }
      } else {
        def fin(d: Double): Any = if (d.isNaN) null else d
        ClosedFormAggregate.result(
          fin(pointEstimate),
          fin(pointEstimate - bound),
          fin(pointEstimate + bound),
          fin(math.abs(bound)),
          fin(relError),
          totalN)
      }
    }
  }

  override def serialize(buffer: ClosedFormBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + buffer.strata.size * 32)
    bb.putLong(buffer.rows)
    bb.putInt(buffer.strata.size)
    buffer.strata.foreach { case (k, s) =>
      bb.putLong(k); bb.putLong(s.n); bb.putDouble(s.sum); bb.putDouble(s.sumSq)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ClosedFormBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new ClosedFormBuffer
    buf.rows = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val k = bb.getLong
      buf.strata.update(k, new StratumStats(bb.getLong, bb.getDouble, bb.getDouble))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ClosedFormAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ClosedFormAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ClosedFormAggregate =
    copy(child = newChildren(0), weight = newChildren(1))

  override def prettyName: String = aggType match {
    case AqpAggType.Sum => "approx_sum_cf"
    case AqpAggType.Avg => "approx_avg_cf"
    case AqpAggType.Count => "approx_count_cf"
  }
}

object ClosedFormAggregate {
  val resultType: StructType = StructType(Seq(
    StructField("estimate", DoubleType),
    StructField("lower_bound", DoubleType),
    StructField("upper_bound", DoubleType),
    StructField("absolute_error", DoubleType),
    StructField("relative_error", DoubleType),
    StructField("sample_count", LongType, nullable = false)))

  private[graft] def result(est: Any, lb: Any, ub: Any, abs: Any, rel: Any,
      n: Long): InternalRow =
    new GenericInternalRow(Array[Any](est, lb, ub, abs, rel, n))

  private val zCache = new java.util.concurrent.ConcurrentHashMap[java.lang.Double, java.lang.Double]()
  def zFactor(confidence: Double): Double =
    zCache.computeIfAbsent(confidence,
      c => new NormalDistribution().inverseCumulativeProbability(0.5 + c / 2.0))

  def apply(c: Column, rawWeight: Column, aggType: AqpAggType.AqpAggType,
      confidence: Double, error: Double, behavior: HacBehavior.HacBehavior): Column =
    Exprs.column(new ClosedFormAggregate(
      Exprs.expression(c), Exprs.expression(rawWeight), aggType, confidence,
      error, behavior).toAggregateExpression())
}
