package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Stateful fuzz of the sample-append path (reference semantics: appends
 * RE-SAMPLE each batch under the STORED stratification and merge —
 * `CREATE SAMPLE TABLE` then `INSERT INTO` / `appendToSample`): random
 * batch sequences with skewed sizes, empty batches, and strata that only
 * appear mid-stream. After every append the Horvitz–Thompson identity
 * must hold EXACTLY against an exact model:
 *
 *  - per stratum, the decoded weights over the sample's rows sum to the
 *    stratum's true cumulative base count (this is what makes every
 *    downstream count/sum estimate unbiased — if an append path ever
 *    re-weighted survivors wrongly or dropped a stratum, it shows here);
 *  - every appended stratum stays represented (a reservoir never empties);
 *  - per-stratum sample size never exceeds the stratum's true count.
 */
class SamplerFuzzSpec extends AnyFunSuite {
  import TestSpark._

  private val Strata = (1 to 8).map(i => s"g$i")

  for (seed <- 1 to 3)
  test(s"append fuzz: HT weight identity through random appends, seed $seed") {
    import spark.implicits._
    val rnd = new scala.util.Random(100 + seed)
    val gs = new GraftSession(spark)
    val name = s"fz_sample_$seed"
    val model = mutable.Map.empty[String, Long]

    def randomBatch(allowNew: Boolean): Seq[(String, Double)] = {
      val pool = if (allowNew) Strata else Strata.take(4)
      (1 to pool.size).flatMap { _ =>
        val g = pool(rnd.nextInt(pool.size))
        val n = rnd.nextInt(120) // may be 0 → stratum absent from batch
        (1 to n).map(_ => (g, rnd.nextDouble() * 100))
      }
    }

    val first = randomBatch(allowNew = false)
    first.foreach { case (g, _) => model(g) = model.getOrElse(g, 0L) + 1 }
    first.toDF("g", "v").createOrReplaceTempView(s"${name}_base")
    gs.sql(s"CREATE SAMPLE TABLE $name ON ${name}_base OPTIONS(" +
      "qcs 'g', fraction '0.1', strataReservoirSize '20')")

    def checkInvariants(tag: String): Unit = {
      val rows = gs.sql(
        s"SELECT g, ${org.apache.spark.sql.graft.Weightage.WeightColumn} FROM $name")
        .collect()
        .map(r => (r.getString(0),
          org.apache.spark.sql.graft.Weightage.decode(r.getLong(1))))
      val byStratum = rows.groupBy(_._1)
      val expected = model.filter(_._2 > 0L)
      assert(byStratum.keySet === expected.keySet,
        s"$tag: strata mismatch (reservoirs must never empty, nor invent)")
      expected.foreach { case (g, n) =>
        val sampled = byStratum(g)
        assert(sampled.length <= n, s"$tag: stratum $g oversampled")
        val wsum = sampled.map(_._2).sum
        assert(math.abs(wsum - n) <= 1e-6 * n + 1e-6,
          s"$tag: stratum $g weight sum $wsum != true count $n")
      }
    }

    checkInvariants("initial")
    (1 to 6).foreach { i =>
      val batch = randomBatch(allowNew = true)
      batch.foreach { case (g, _) => model(g) = model.getOrElse(g, 0L) + 1 }
      if (batch.nonEmpty) {
        gs.appendToSample(name, batch.toDF("g", "v"))
      }
      checkInvariants(s"append $i")
    }

    // the estimates the identity exists for: WITH ERROR count per stratum
    // must equal the exact cumulative counts (full HT, zero sampling error
    // for counts by construction)
    val est = gs.sql(
      s"""SELECT g, count(*) AS c, absolute_error(c)
         |FROM ${name}_base GROUP BY g WITH ERROR""".stripMargin)
    val got = est.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the registered base view only holds the FIRST batch; route through
    // the sample directly instead for the cumulative contract
    val direct = gs.sql(
      s"""SELECT g, count(*) AS c, absolute_error(c)
         |FROM $name GROUP BY g WITH ERROR""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    model.filter(_._2 > 0L).foreach { case (g, n) =>
      assert(direct(g) === n, s"direct-sample count estimate for $g")
    }
    assert(got.nonEmpty)
    gs.dropSampleTable(name)
  }
}
