package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, LongType}

/**
 * `pack_weightage(numSamples, stratumTotal, keyHash)` → packed weight long
 * (see [[Weightage]] for the layout). Used by the stratified sampler to
 * attach the hidden weight column; interpreted eval only (runs once per
 * output row of the sampling job, not in any per-query hot path).
 */
case class PackWeightage(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType, IntegerType)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val n = first.eval(input)
    val t = second.eval(input)
    val h = third.eval(input)
    if (n == null || t == null) 0L
    else Weightage.pack(
      n.asInstanceOf[Long], t.asInstanceOf[Long],
      if (h == null) 0 else h.asInstanceOf[Int])
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PackWeightage = copy(f, s, t)
}

object PackWeightage {
  def apply(num: Column, total: Column, keyHash: Column): Column =
    Exprs.column(PackWeightage(
      Exprs.expression(num), Exprs.expression(total), Exprs.expression(keyHash)))
}
