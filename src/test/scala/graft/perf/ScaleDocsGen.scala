package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Committed generator for the unique-content document scale corpora
 * (`/tmp/sf1u`..`/tmp/sf100u` decade points) — the recipe BENCH_sf1.md
 * documents, now executable instead of prose: per replica k, doc_ids
 * remapped (+k·10⁷) and text passed through a PER-REPLICA SEEDED
 * SUBSTITUTION CIPHER (a Fisher–Yates permutation of a–z and of 0–9,
 * seeded by k), so with overwhelming probability every character shingle
 * of width >= 2 changes across replicas, while within-replica structure
 * stays byte-isomorphic to the source. (Not a derangement guarantee: a
 * Fisher–Yates permutation has ~1 expected fixed point and two replicas'
 * permutations agree on ~1 letter in expectation, so a rare SINGLE-char
 * shingle can survive identically — the dedup gates shingle at width 5,
 * where survival needs 5 simultaneous agreements, ~(1/26)⁵ per position.)
 * Replica 0 is the IDENTITY, so any planted structure in the source
 * survives verbatim.
 *
 * Corpus-hygiene lessons baked in, in order found:
 *  - token PREFIXING rejected (r13) — interior shingles survive inside
 *    `r3xbatch` vs `r7xbatch`, cross-replica signature similarity stays
 *    ~0.5, and candidate growth turns quadratic BY CORPUS CONSTRUCTION;
 *  - CAESAR rotation rejected (r14) — the bench corpus contains NO
 *    digits, so rotation's effective period is 26: replicas k and k+26
 *    produced byte-IDENTICAL text under remapped doc_ids. The 100-replica
 *    sf10u corpus therefore carried ~3.85 exact copies of every document
 *    (22 rotation classes of 4 + 4 of 3 → 144 constructed exact-dup
 *    PAIRS per source doc ≈ 720k distinct pairs over 5k source docs, the
 *    BENCH_sf1 addendum-13 derivation — which the 16-band LSH emitted
 *    once per agreeing band as ~10M of the 13.2M PRE-distinct candidates
 *    the r13 floor decomposition attributed to the operator),
 *    and a 1000-replica corpus would have made candidate volume grow
 *    quadratically in replicas. A seeded permutation has no period.
 *
 * Usage: Test/runMain graft.perf.ScaleDocsGen <out> [replicas] [srcDir]
 * e.g. `/tmp/sf100u 1000 /root/testdata/sf0.1` = 5M docs.
 */
object ScaleDocsGen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/sf100u")
    val replicas = if (args.length > 1) args(1).toInt else 1000
    val src = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = generate(spark, out, replicas, src)
    println(s"GEN $out: $n docs")
    spark.stop()
  }

  /** Per-replica substitution alphabet: permutations of a–z and 0–9 from a
   * replica-seeded Fisher–Yates shuffle (identity at k = 0). Distinct
   * replicas share a letter permutation with probability ~n²/26! — no
   * period at any replica count, unlike rotation. */
  private val substCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Char], Array[Char])]()

  private def substitution(k: Int): (Array[Char], Array[Char]) =
    substCache.computeIfAbsent(k, buildSubstitution)

  private def buildSubstitution(k: Int): (Array[Char], Array[Char]) = {
    def perm(chars: Array[Char], seed: Long): Array[Char] = {
      val a = chars.clone()
      val rnd = new scala.util.Random(seed)
      var i = a.length - 1
      while (i > 0) {
        val j = rnd.nextInt(i + 1)
        val t = a(i); a(i) = a(j); a(j) = t
        i -= 1
      }
      a
    }
    val letters = ('a' to 'z').toArray
    val digits = ('0' to '9').toArray
    if (k == 0) (letters, digits)
    else (perm(letters, 0x5EEDL ^ (k.toLong * 0x9E3779B97F4A7C15L)),
      perm(digits, 0xD161L ^ (k.toLong * 0xBF58476D1CE4E5B9L)))
  }

  /** Writes `$out/documents.parquet` (the substitution-ciphered
   * unique-content corpus) and returns the row count. Shared with
   * ScaleDirGen. */
  def generate(spark: SparkSession, out: String, replicas: Int,
      src: String): Long = {
    val base = spark.read.parquet(s"$src/documents.parquet")
    val cipher = udf { (k: Int, s: String) =>
      if (s == null) null
      else {
        val (letters, digits) = substitution(k)
        val b = new StringBuilder(s.length)
        s.foreach {
          case c if c >= 'a' && c <= 'z' => b.append(letters(c - 'a'))
          case c if c >= 'A' && c <= 'Z' => b.append(letters(c - 'A').toUpper)
          case c if c >= '0' && c <= '9' => b.append(digits(c - '0'))
          case c => b.append(c)
        }
        b.toString
      }
    }
    spark.range(replicas).select(col("id").cast("int").as("rep"))
      .crossJoin(broadcast(base))
      .select(
        (col("rep").cast("long") * lit(10000000L) + col("doc_id")).as("doc_id"),
        cipher(col("rep"), col("text")).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    spark.read.parquet(s"$out/documents.parquet").count()
  }
}
