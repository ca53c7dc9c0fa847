package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, LongType}

/**
 * `pack_weightage(numSamples, stratumTotal, keyHash)` → packed weight long
 * (see [[Weightage]] for the layout). Used by the stratified sampler to
 * attach the hidden weight column; codegen'd so sample materialization
 * stays inside whole-stage codegen.
 */
case class PackWeightage(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType, IntegerType)

  override protected def nullSafeEval(n: Any, t: Any, h: Any): Any =
    Weightage.pack(n.asInstanceOf[Long], t.asInstanceOf[Long], h.asInstanceOf[Int])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (n, t, h) =>
      s"org.apache.spark.sql.graft.Weightage.pack($n, $t, $h)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PackWeightage = copy(f, s, t)
}

object PackWeightage {
  def apply(num: Column, total: Column, keyHash: Column): Column =
    Exprs.column(PackWeightage(
      Exprs.expression(num), Exprs.expression(total), Exprs.expression(keyHash)))
}
