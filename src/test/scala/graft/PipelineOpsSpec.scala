package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Pipeline

class PipelineOpsSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("stratified split: exact per-stratum proportions, deterministic, disjoint") {
    val s = Pipeline.stratifiedSplit(docs, Seq(col("lang")), 0.2)
    val counts = s.groupBy("lang", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (lang, n) =>
      val test = counts.getOrElse((lang, "test"), 0L)
      assert(test === math.ceil(n * 0.2).toLong, s"$lang test size")
      assert(test + counts.getOrElse((lang, "train"), 0L) === n)
    }
    // deterministic
    val again = Pipeline.stratifiedSplit(docs, Seq(col("lang")), 0.2)
      .filter(col("split") === "test").agg(sum(col("doc_id"))).collect()(0).getLong(0)
    val first = s.filter(col("split") === "test").agg(sum(col("doc_id"))).collect()(0).getLong(0)
    assert(again === first)
  }

  test("stratified split: exact counts when the boundary row is duplicated") {
    import spark.implicits._
    // stratum "dup": 4 copies of one row + 6 unique; stratum "uni": all
    // identical rows. Content duplicates share the boundary hash — the split
    // must still be exactly ceil(0.2·n) / ceil(0.5·n) per stratum.
    val rows =
      (1 to 6).map(i => ("dup", s"unique text $i")) ++
        Seq.fill(4)(("dup", "copied text")) ++
        Seq.fill(10)(("uni", "all the same"))
    val df = rows.toDF("k", "v")
    for (frac <- Seq(0.2, 0.5, 0.7)) {
      val s = Pipeline.stratifiedSplit(df, Seq(col("k")), frac)
      val counts = s.groupBy("k", "split").count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      for (k <- Seq("dup", "uni")) {
        val t = counts.getOrElse((k, "test"), 0L)
        assert(t === math.ceil(10 * frac).toLong, s"stratum $k frac $frac: $t")
        assert(t + counts.getOrElse((k, "train"), 0L) === 10L)
      }
    }
  }

  test("chunking: full coverage, overlap honored, index ordering") {
    import spark.implicits._
    val text = (1 to 25).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val out = Pipeline.chunk(df, "text", chunkTokens = 10, overlap = 2)
      .orderBy("chunk_index").collect()
    assert(out.length === 3) // stride 8: [1..10],[9..18],[17..25]
    val c0 = out(0).getAs[String]("chunk_text").split(" ")
    val c1 = out(1).getAs[String]("chunk_text").split(" ")
    assert(c0.length === 10 && c0.head === "w1" && c0.last === "w10")
    assert(c1.head === "w9", "overlap of 2 tokens carried")
    val all = out.flatMap(_.getAs[String]("chunk_text").split(" ")).toSet
    assert(all === (1 to 25).map(i => s"w$i").toSet, "every token covered")
  }

  test("chunking short documents yields one chunk") {
    import spark.implicits._
    val out = Pipeline.chunk(Seq((1L, "a b c")).toDF("id", "text"), "text", 10)
      .collect()
    assert(out.length === 1)
    assert(out(0).getAs[String]("chunk_text") === "a b c")
  }

  test("contamination check finds planted eval-set leakage") {
    import spark.implicits._
    val evalDocs = docs.orderBy("doc_id").limit(5)
      .select(col("doc_id"), col("text"))
    val corpus = docs.select(col("doc_id"), col("text"))
    val hits = Pipeline.contaminationCheck(corpus, evalDocs, "doc_id", "text",
      n = 8, minShared = 3)
    val hitIds = hits.collect().map(_.getLong(0)).toSet
    // the five eval docs themselves are in the corpus → must all be flagged
    val planted = evalDocs.collect().map(_.getLong(0)).toSet
    assert(planted.subsetOf(hitIds), s"missed: ${planted -- hitIds}")
  }
}
