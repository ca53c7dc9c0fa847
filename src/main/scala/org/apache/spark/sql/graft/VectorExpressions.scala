package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * `nearest_centroid(vec)`: index of the closest centroid (squared L2) for an
 * `array<float|double>` column, with ties broken toward the lower index.
 *
 * The centroid table rides along as a literal inside the expression (it is
 * the IVF coarse codebook — `nClusters × dim` doubles, a few MB at most), so
 * cluster assignment is a pure per-row map: no cross join against a centroid
 * relation, no per-id window sort, no shuffle. On a 100 TB corpus this is the
 * difference between a narrow scan and re-shuffling the whole table per Lloyd
 * iteration. (For codebooks too big to ship with the task — 10⁵+ centroids —
 * use a bucketed join instead; IVF coarse quantizers are far below that.)
 */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {
  require(centroids.nonEmpty, "need at least one centroid")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val vec = new Array[Double](dim)
    var i = 0
    if (isFloat) while (i < dim) { vec(i) = arr.getFloat(i); i += 1 }
    else while (i < dim) { vec(i) = arr.getDouble(i); i += 1 }
    var best = 0
    var bestDist = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      val d = math.min(dim, cen.length)
      var dist = 0.0
      var j = 0
      while (j < d) { val t = vec(j) - cen(j); dist += t * t; j += 1 }
      if (dist < bestDist) { bestDist = dist; best = c }
      c += 1
    }
    best
  }

  // the centroid payload is identity-compared by default; make semantically
  // equal expressions (same data) compare equal for plan canonicalization
  override def equals(other: Any): Boolean = other match {
    case NearestCentroid(c, cen) =>
      c == child && cen.length == centroids.length &&
        cen.zip(centroids).forall { case (a, b) => java.util.Arrays.equals(a, b) }
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.deepHashCode(
      centroids.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  def apply(c: Column, centroids: Array[Array[Double]]): Column =
    Exprs.column(new NearestCentroid(Exprs.expression(c), centroids))
}
