package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.Ann

/**
 * Product-quantization semantics: the exact regime (every subvector a
 * centroid → PQ ranking equals brute force bit-for-bit), encode parity with
 * a driver-side re-computation, and the ADC identity
 * `adc(code) = ⟨query, reconstruct(code)⟩`.
 */
class PqSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private def queryVec: Array[Float] =
    emb.filter(col("vec_id") === 0).select(col("embedding"))
      .collect()(0).getSeq[Float](0).toArray

  test("exact regime: <= k distinct vectors make PQ ranking equal brute force") {
    // 40 distinct vectors, k = 64: Lloyd seeds every distinct subvector as
    // its own centroid and converges immediately -> zero quantization error
    // -> ADC inner product == true inner product -> identical ranking
    val small = emb.orderBy(col("vec_id")).limit(40)
    val cb = Ann.pqTrain(small, "embedding", m = 8, k = 64, iterations = 3)
    val enc = Ann.pqEncode(small, "embedding", cb)
    val q = queryVec
    val got = Ann.pqKnn(enc, cb, "vec_id", "embedding", q, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val want = Ann.bruteForceKnn(small, "vec_id", "embedding", q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq === want.toSeq)
  }

  test("PqEncode matches a driver-side nearest-centroid encoding") {
    val cb = Ann.pqTrain(emb, "embedding", m = 8, k = 32, iterations = 5)
    val got = Ann.pqEncode(emb, "embedding", cb)
      .select(col("vec_id"), col("__graft_pq__"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    vecs.foreach { case (id, v) =>
      val code = (0 until cb.m).map { j =>
        val sub = v.slice(j * cb.dsub, (j + 1) * cb.dsub)
        cb.centroids(j).zipWithIndex.minBy { case (c, i) =>
          (c.zip(sub).map { case (a, b) => (a - b) * (a - b) }.sum, i)
        }._2.toByte
      }
      assert(got(id) === code, s"vec $id")
    }
  }

  test("ADC identity: PqAdcDot equals the dot with the reconstructed vector") {
    val cb = Ann.pqTrain(emb, "embedding", m = 4, k = 16, iterations = 3)
    val q = queryVec.map(_.toDouble)
    val luts = Array.tabulate(cb.m) { j =>
      Array.tabulate(cb.centroids(j).length) { c =>
        val cent = cb.centroids(j)(c)
        (0 until cb.dsub).map(i => q(j * cb.dsub + i) * cent(i)).sum
      }
    }
    val rows = Ann.pqEncode(emb, "embedding", cb)
      .select(col("vec_id"), col("__graft_pq__"),
        org.apache.spark.sql.graft.PqAdcDot(col("__graft_pq__"), luts).as("adc"))
      .collect()
    rows.foreach { r =>
      val code = r.getAs[Array[Byte]](1)
      val recon = (0 until cb.m).flatMap(j => cb.centroids(j)(code(j) & 0xff))
      val want = recon.zip(q).map { case (a, b) => a * b }.sum
      assert(math.abs(r.getDouble(2) - want) < 1e-9, s"vec ${r.getLong(0)}")
    }
  }

  test("VecNorm equals the sqrt-sum-of-squares algebra") {
    val diff = emb.select(abs(
      org.apache.spark.sql.graft.VecNorm(col("embedding")) -
        sqrt(aggregate(transform(col("embedding"), x => x.cast("double") * x),
          lit(0.0), (acc, x) => acc + x))).as("d"))
      .agg(max(col("d"))).collect()(0).getDouble(0)
    assert(diff < 1e-9)
  }

  test("IVF-PQ: probe-all equals plain PQ; pruned probe keeps recall") {
    val (assigned, cents) = Ann.ivfIndex(emb, "vec_id", "embedding",
      nClusters = 8, lloydIterations = 2)
    try {
      val cb = Ann.pqTrain(emb, "embedding", m = 8, k = 64, iterations = 10)
      val indexed = Ann.pqEncode(assigned, "embedding", cb)
      val q = queryVec
      // probing every cluster must reduce IVF-PQ to plain PQ exactly
      val all = Ann.ivfPqKnn(indexed, cents, cb, "vec_id", "embedding", q,
        k = 10, nprobe = cents.length)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val plain = Ann.pqKnn(Ann.pqEncode(emb, "embedding", cb), cb,
        "vec_id", "embedding", q, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(all === plain)
      // a pruned probe still finds most of the true neighborhood
      val pruned = Ann.ivfPqKnn(indexed, cents, cb, "vec_id", "embedding", q,
        k = 10, nprobe = 4)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      val brute = Ann.bruteForceKnn(emb, "vec_id", "embedding", q, 10)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      assert(pruned.intersect(brute).size >= 5,
        s"ivf-pq recall ${pruned.intersect(brute).size}/10")
    } finally assigned.unpersist()
  }

  test("recall: PQ top-10 overlaps brute-force top-10 on the full table") {
    val cb = Ann.pqTrain(emb, "embedding", m = 8, k = 64, iterations = 10)
    val enc = Ann.pqEncode(emb, "embedding", cb)
    val q = queryVec
    val got = Ann.pqKnn(enc, cb, "vec_id", "embedding", q, k = 10)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val want = Ann.bruteForceKnn(emb, "vec_id", "embedding", q, 10)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(got.intersect(want).size >= 7, s"recall ${got.intersect(want).size}/10")
  }
}
