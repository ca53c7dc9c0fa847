package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Product-quantization kernels (Jégou et al., "Product Quantization for
 * Nearest Neighbor Search", TPAMI 2011) — the memory-compression scale path
 * for ANN: a d-dim float vector becomes m bytes, so a 100 TB embedding
 * corpus scans as ~1.5 TB of codes. All kernels are fused single-pass
 * expressions over the array column (no UDFs, no per-dimension lambda
 * algebra). The reference engine has no vector ops; this follows the
 * published algorithm.
 */
private[graft] object PqExpressions {
  def elemAt(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** `pq_encode(vec)`: nearest centroid id per subspace → m-byte code.
 * `codebooks(j)(c)` is the c-th centroid of subspace j (dsub doubles). */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  require(codebooks.nonEmpty && codebooks.forall(_.length <= 256),
    "PQ codebooks must have at most 256 centroids per subspace (byte codes)")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  private lazy val isFloat = PqExpressions.isFloatArray(child.dataType)
  private val m = codebooks.length
  private val dsub = codebooks(0)(0).length

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      val base = j * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val diff = PqExpressions.elemAt(arr, base + i, isFloat) - cent(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  def apply(c: Column, codebooks: Array[Array[Array[Double]]]): Column =
    Exprs.column(new PqEncode(Exprs.expression(c), codebooks))
}

/** `pq_adc_dot(code)`: Σ_j luts(j)(code(j)) — with `luts(j)(c) =
 * ⟨query_sub_j, centroid_{j,c}⟩` this is the inner product of the query
 * with the reconstructed vector (asymmetric distance computation). One
 * table lookup per code byte; never touches the original vector. */
case class PqAdcDot(child: Expression, luts: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  private val m = luts.length

  override def nullSafeEval(v: Any): Any = {
    val code = v.asInstanceOf[Array[Byte]]
    var s = 0.0
    var j = 0
    while (j < m) {
      s += luts(j)(code(j) & 0xff)
      j += 1
    }
    s
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcDot =
    copy(child = newChild)
}

object PqAdcDot {
  def apply(c: Column, luts: Array[Array[Double]]): Column =
    Exprs.column(new PqAdcDot(Exprs.expression(c), luts))
}

/** `vec_norm(vec)`: √(Σ x²) in one fused pass. */
case class VecNorm(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  private lazy val isFloat = PqExpressions.isFloatArray(child.dataType)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val x = PqExpressions.elemAt(arr, i, isFloat)
      s += x * x
      i += 1
    }
    math.sqrt(s)
  }

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}

object VecNorm {
  def apply(c: Column): Column = Exprs.column(new VecNorm(Exprs.expression(c)))
}
