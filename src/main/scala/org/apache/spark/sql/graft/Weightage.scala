package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, LongType}

/**
 * Packed stratum-weight encoding for stratified samples.
 *
 * A sample row carries one hidden `LongType` column encoding the sampling
 * ratio of its stratum:
 *
 *   bits 40..63  numSamples     (rows kept in the stratum, 24 bits)
 *   bits  8..39  stratumTotal   (rows seen in the stratum, 32 bits)
 *   bits  0..7   stratum-key hash (disambiguates distinct strata that happen
 *                to share identical counts, so per-stratum state keyed by the
 *                raw weight does not accidentally merge them)
 *
 * The decoded weight is `stratumTotal / numSamples` — the Horvitz–Thompson
 * inverse-inclusion-probability ratio. A raw value of 0 (or numSamples == 0)
 * decodes to 1.0 (unsampled data).
 *
 * Layout follows the reference encoding
 * (snappy-aqp `execution/stratifiedSampling.scala:749-760`), with one
 * scale-proofing extension: strata whose counts exceed the field widths are
 * re-approximated as the best in-range rational `t/n` for the true ratio —
 * the kept count is reduced only as far as the 32-bit total field requires,
 * so the decoded weight matches the true ratio to ~1/(2·t) relative error.
 * Ratios beyond `TotalMask` (a stratum keeping fewer than one in ~4.2e9
 * rows) clamp to `TotalMask` — never to 1.0.
 */
object Weightage {
  final val WeightColumn = "snappy_sampler_weightage"

  final val NumSamplesMask = 0xffffffL
  final val TotalMask = 0xffffffffL

  def pack(numSamples: Long, stratumTotal: Long, keyHash: Int): Long = {
    if (numSamples <= 0) return 0L
    var n = numSamples
    var t = math.max(stratumTotal, numSamples)
    if (n > NumSamplesMask || t > TotalMask) {
      // out-of-range counts: re-approximate the ratio t/n at reduced counts.
      // (Truncating right-shifts of both fields would zero a small kept
      // count — decoding as weight 1.0 — or bias the ratio by up to 2x.)
      val r = t.toDouble / n.toDouble
      n = math.min(math.min(numSamples, NumSamplesMask),
        math.max(1L, (TotalMask / r).toLong))
      t = math.min(TotalMask, math.round(n * r))
      if (t < n) t = n
    }
    ((n & NumSamplesMask) << 40) | ((t & TotalMask) << 8) | (keyHash & 0xff).toLong
  }

  def numSamples(raw: Long): Long = (raw >> 40) & NumSamplesMask
  def stratumTotal(raw: Long): Long = (raw >> 8) & TotalMask

  def decode(raw: Long): Double = {
    val n = numSamples(raw)
    if (n == 0L) 1.0 else stratumTotal(raw).toDouble / n.toDouble
  }

  /** `Column` producing the decoded double ratio from the packed long. */
  def mapColumnToWeight(c: Column): Column =
    Exprs.column(MapColumnToWeight(Exprs.expression(c)))
}

/**
 * Scalar expression decoding the packed weight long into a double ratio,
 * with codegen so it stays inside whole-stage codegen in hot aggregation
 * paths. Semantics per reference `execution/common/WeightedAggregates.scala:230-311`.
 */
case class MapColumnToWeight(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 1.0d
    else {
      val raw = v.asInstanceOf[Long]
      val n = (raw >> 40) & Weightage.NumSamplesMask
      if (n == 0L) 1.0d else ((raw >> 8) & Weightage.TotalMask).toDouble / n.toDouble
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val raw = ctx.freshName("raw")
    val n = ctx.freshName("n")
    ev.copy(
      code = childGen.code +
        code"""
           |double ${ev.value} = 1.0d;
           |if (!${childGen.isNull}) {
           |  long $raw = ${childGen.value};
           |  long $n = ($raw >> 40) & ${Weightage.NumSamplesMask}L;
           |  if ($n != 0L) {
           |    ${ev.value} = (double) (($raw >> 8) & ${Weightage.TotalMask}L) / (double) $n;
           |  }
           |}
           """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MapColumnToWeight =
    copy(child = newChild)
}
