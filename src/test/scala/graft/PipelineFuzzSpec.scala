package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Pipeline

/**
 * Seeded fuzz of the prefix-sum family — the backbone of the token-budget
 * selection / sequence-packing / mixture gates — against single-threaded
 * brute force, over random shapes the hand-written specs don't reach:
 * duplicate order keys, zero-token rows, tiny and empty frames, random
 * partition layouts, and random bucket counts (including more buckets
 * than rows).
 */
class PipelineFuzzSpec extends AnyFunSuite {
  import TestSpark._

  for (seed <- 1 to 3)
  test(s"prefixSum / selectByTokenBudget / packSequences vs brute force, seed $seed") {
    import spark.implicits._
    val rnd = new scala.util.Random(900 + seed)
    (1 to 4).foreach { scenarioNo =>
      val n = rnd.nextInt(300)
      val rows = (1 to n).map { i =>
        // duplicate-prone priority keys and zero tokens exercise the
        // boundary-quantile and empty-contribution paths
        (i.toLong, rnd.nextInt(8).toLong, rnd.nextInt(15).toLong)
      }
      val buckets = 1 + rnd.nextInt(12)
      val parts = 1 + rnd.nextInt(7)
      val df = rows.toDF("id", "pri", "tok").repartition(parts)
      val order = Seq(col("pri"), col("id"))
      val sortedRows = rows.sortBy(r => (r._2, r._1))

      // prefixSum == global cumulative sum in (pri, id) order
      val got = Pipeline.prefixSum(df, order, col("tok"), "cum", buckets = buckets)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      var run = 0L
      val want = sortedRows.map { r => run += r._3; r._1 -> run }.toMap
      assert(got === want, s"seed=$seed#$scenarioNo n=$n buckets=$buckets prefixSum")

      if (n > 0) {
        // selectByTokenBudget == maximal prefix under the same order
        val budget = math.max(1L, rnd.nextLong(math.max(1L, run + 10)))
        val sel = Pipeline.selectByTokenBudget(df, col("tok"), order, budget)
          .collect().map(_.getLong(0)).toSet
        var acc = 0L
        val expect = sortedRows.takeWhile { r => acc += r._3; acc <= budget }
          .map(_._1).toSet
        assert(sel === expect, s"seed=$seed#$scenarioNo budget=$budget select")

        // packSequences: offsets are the exclusive prefix sums, packs
        // bounded, every row placed exactly once
        val b = 1 + rnd.nextInt(40)
        val packed = Pipeline.packSequences(df, col("tok"), order, b)
          .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("tok"),
            r.getAs[Long]("token_offset"), r.getAs[Long]("seq_offset")))
        assert(packed.map(_._1).distinct.length === n, "every row exactly once")
        var off = 0L
        val byOrder = packed.sortBy(_._3)
        sortedRows.zip(byOrder).foreach { case (r, p) =>
          assert(p._1 === r._1 && p._3 === off,
            s"seed=$seed#$scenarioNo pack order/offset for id ${r._1}")
          assert(p._4 === off % b && p._4 < b, "seq_offset in bounds")
          off += r._3
        }
      }
    }
  }
}
