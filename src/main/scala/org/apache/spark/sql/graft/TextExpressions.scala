package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `rolling_fingerprint(text, k)`: min of polynomial rolling hashes over the
 * character k-grams of whitespace-normalized lowercase text — the winnowing
 * primitive for document fingerprinting. O(n) per document, deterministic.
 */
case class RollingFingerprint(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val s = RollingFingerprint.normalize(v.asInstanceOf[UTF8String].toString)
    if (s.length < k) RollingFingerprint.hashChunk(s)
    else {
      // polynomial rolling hash: h_i+1 = (h_i - s[i]*B^(k-1))*B + s[i+k]
      val B = 1315423911L
      var pow = 1L
      var i = 0
      while (i < k - 1) { pow *= B; i += 1 }
      var h = 0L
      i = 0
      while (i < k) { h = h * B + s.charAt(i); i += 1 }
      var min = RollingFingerprint.mix(h)
      i = k
      while (i < s.length) {
        h = (h - s.charAt(i - k) * pow) * B + s.charAt(i)
        val m = RollingFingerprint.mix(h)
        if (m < min) min = m
        i += 1
      }
      min
    }
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

object RollingFingerprint {
  private[graft] def normalize(s: String): String =
    s.toLowerCase.replaceAll("\\s+", " ").trim

  private[graft] def hashChunk(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = h * 1315423911L + s.charAt(i); i += 1 }
    mix(h)
  }

  /** finalizer (splitmix64) decorrelates consecutive rolling hashes */
  private[graft] def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def apply(c: Column, k: Int): Column =
    Exprs.column(new RollingFingerprint(Exprs.expression(c), k))
}

/**
 * `minhash_signature(text, numHashes, k)`: MinHash signature over character
 * k-gram shingles. One base 64-bit hash per shingle (rolling, O(n)), then
 * `numHashes` universal-hash projections `a_i·h + b_i` — the standard
 * one-pass construction. Returns `array<bigint>`.
 */
case class MinHashSignature(child: Expression, numHashes: Int, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  // flat primitive arrays: the update loop below runs numShingles×numHashes
  // times per document, so no per-access indirection
  @transient private lazy val (coeffA, coeffB): (Array[Long], Array[Long]) = {
    val rng = new java.util.SplittableRandom(0x5eed5eedL)
    val a = new Array[Long](numHashes)
    val b = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) { a(i) = rng.nextLong() | 1L; b(i) = rng.nextLong(); i += 1 }
    (a, b)
  }

  override def nullSafeEval(v: Any): Any = {
    val s = RollingFingerprint.normalize(v.asInstanceOf[UTF8String].toString)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val B = 1315423911L
    if (s.length <= k) {
      updateSig(sig, RollingFingerprint.hashChunk(s))
    } else {
      var pow = 1L
      var i = 0
      while (i < k - 1) { pow *= B; i += 1 }
      var h = 0L
      i = 0
      while (i < k) { h = h * B + s.charAt(i); i += 1 }
      updateSig(sig, RollingFingerprint.mix(h))
      i = k
      while (i < s.length) {
        h = (h - s.charAt(i - k) * pow) * B + s.charAt(i)
        updateSig(sig, RollingFingerprint.mix(h))
        i += 1
      }
    }
    new GenericArrayData(sig)
  }

  @inline private def updateSig(sig: Array[Long], shingleHash: Long): Unit = {
    val a = coeffA
    val b = coeffB
    var j = 0
    while (j < numHashes) {
      val hj = a(j) * shingleHash + b(j)
      if (hj < sig(j)) sig(j) = hj
      j += 1
    }
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  def apply(c: Column, numHashes: Int, k: Int): Column =
    Exprs.column(new MinHashSignature(Exprs.expression(c), numHashes, k))
}

/**
 * `simhash64(text)`: 64-bit SimHash over whitespace tokens — per token a
 * 64-bit hash votes ±1 on each bit; the sign vector is the fingerprint.
 * Near-duplicate texts land within small Hamming distance.
 */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val s = RollingFingerprint.normalize(v.asInstanceOf[UTF8String].toString)
    if (s.isEmpty) 0L
    else {
      val votes = new Array[Int](64)
      var start = 0
      var i = 0
      val n = s.length
      while (i <= n) {
        if (i == n || s.charAt(i) == ' ') {
          if (i > start) {
            var h = 0L
            var j = start
            while (j < i) { h = h * 31L + s.charAt(j); j += 1 }
            h = RollingFingerprint.mix(h)
            var b = 0
            while (b < 64) {
              if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
              b += 1
            }
          }
          start = i + 1
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
      out
    }
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def apply(c: Column): Column = Exprs.column(new SimHash64(Exprs.expression(c)))
}

/**
 * `word_ngram_hashes(text, n)`: distinct 64-bit hashes of the word n-grams of
 * whitespace-normalized lowercase text, as `array<bigint>`. One pass over the
 * characters: per-token polynomial hashes combine through a rolling window of
 * n token hashes; a doc shorter than n tokens yields the hash of its full
 * token sequence (mirroring [[graft.dedup.Dedup.wordNgrams]]).
 *
 * Exists for the hot paths (contamination checks, n-gram fingerprints) where
 * the equivalent `transform(sequence…, slice+concat_ws)` column algebra
 * generates a codegen method big enough to stay interpreted/JIT-cold and
 * materializes every n-gram string; this emits only the longs.
 */
case class WordNgramHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"n-gram size must be >= 1: $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val s = RollingFingerprint.normalize(v.asInstanceOf[UTF8String].toString)
    // token polynomial hashes (base 31, mixed), matching none in particular —
    // any stable 64-bit hash works; membership tests only compare hashes
    val tok = new scala.collection.mutable.ArrayBuffer[Long](64)
    var start = 0
    var i = 0
    val len = s.length
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        if (i > start) {
          var h = 0L
          var j = start
          while (j < i) { h = h * 31L + s.charAt(j); j += 1 }
          tok += RollingFingerprint.mix(h)
        }
        start = i + 1
      }
      i += 1
    }
    val m = tok.length
    val out = new java.util.HashSet[Long]()
    if (m < n) {
      // whole (possibly empty) token sequence as the single gram
      var h = 0L
      var j = 0
      while (j < m) { h = h * 0x100000001b3L + tok(j); j += 1 }
      out.add(RollingFingerprint.mix(h))
    } else {
      var g = 0
      while (g + n <= m) {
        var h = 0L
        var j = g
        while (j < g + n) { h = h * 0x100000001b3L + tok(j); j += 1 }
        out.add(RollingFingerprint.mix(h))
        g += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgramHashes =
    copy(child = newChild)
}

object WordNgramHashes {
  def apply(c: Column, n: Int): Column =
    Exprs.column(new WordNgramHashes(Exprs.expression(c), n))
}

/**
 * `ngram_profile(text, n)`: occurrence profile of the word n-grams of
 * whitespace-normalized lowercase text, as
 * `struct<total_grams:int, distinct_grams:int, top_gram_count:int>` — the
 * inputs to the classic corpus-quality repetition rules (duplicate-n-gram
 * fraction and most-frequent-n-gram coverage, as in Gopher/C4 filtering;
 * the reference engine has no text ops). Same single-pass token hashing as
 * [[WordNgramHashes]]; a doc shorter than n tokens profiles its whole token
 * sequence as the single gram (total = distinct = top = 1).
 */
case class NgramProfile(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"n-gram size must be >= 1: $n")
  override def dataType: DataType = NgramProfile.resultType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val s = RollingFingerprint.normalize(v.asInstanceOf[UTF8String].toString)
    val tok = new scala.collection.mutable.ArrayBuffer[Long](64)
    var start = 0
    var i = 0
    val len = s.length
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        if (i > start) {
          var h = 0L
          var j = start
          while (j < i) { h = h * 31L + s.charAt(j); j += 1 }
          tok += RollingFingerprint.mix(h)
        }
        start = i + 1
      }
      i += 1
    }
    val m = tok.length
    val counts = new java.util.HashMap[Long, Int]()
    var total = 0
    def add(h: Long): Unit = {
      val c = counts.get(h)
      counts.put(h, if (counts.containsKey(h)) c + 1 else 1)
      total += 1
    }
    if (m < n) {
      var h = 0L
      var j = 0
      while (j < m) { h = h * 0x100000001b3L + tok(j); j += 1 }
      add(RollingFingerprint.mix(h))
    } else {
      var g = 0
      while (g + n <= m) {
        var h = 0L
        var j = g
        while (j < g + n) { h = h * 0x100000001b3L + tok(j); j += 1 }
        add(RollingFingerprint.mix(h))
        g += 1
      }
    }
    var top = 0
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next(); if (c > top) top = c }
    InternalRow(total, counts.size, top)
  }

  override protected def withNewChildInternal(newChild: Expression): NgramProfile =
    copy(child = newChild)
}

object NgramProfile {
  val resultType: StructType = StructType(Seq(
    StructField("total_grams", IntegerType, nullable = false),
    StructField("distinct_grams", IntegerType, nullable = false),
    StructField("top_gram_count", IntegerType, nullable = false)))

  def apply(c: Column, n: Int): Column =
    Exprs.column(new NgramProfile(Exprs.expression(c), n))
}

/**
 * `chunk_tokens(text, chunkTokens, overlap)`: split text into whitespace
 * tokens and emit `array<string>` of chunks of `chunkTokens` tokens with
 * `overlap` tokens carried between consecutive chunks (stride =
 * chunkTokens − overlap). Single pass; semantics identical to the
 * `transform(sequence…, concat_ws(" ", slice(tokens, …)))` algebra
 * (chunks re-join tokens with single spaces; blank text yields one empty
 * chunk), which generates too much code to JIT on wide plans.
 */
case class ChunkTokens(child: Expression, chunkTokens: Int, overlap: Int)
    extends UnaryExpression with CodegenFallback {
  require(chunkTokens > overlap, "chunkTokens must exceed overlap")
  private val stride = chunkTokens - overlap

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString.trim
    // token boundaries
    val starts = new scala.collection.mutable.ArrayBuffer[Int](64)
    val ends = new scala.collection.mutable.ArrayBuffer[Int](64)
    var i = 0
    var inTok = false
    while (i < s.length) {
      val ws = Character.isWhitespace(s.charAt(i))
      if (!ws && !inTok) { starts += i; inTok = true }
      if (ws && inTok) { ends += i; inTok = false }
      i += 1
    }
    if (inTok) ends += s.length
    val m = starts.length
    val nChunks = math.max(1,
      math.ceil((m - overlap).toDouble / stride).toInt)
    val out = new Array[Any](nChunks)
    var cIdx = 0
    while (cIdx < nChunks) {
      val from = cIdx * stride
      val until = math.min(from + chunkTokens, m)
      if (from >= m) out(cIdx) = UTF8String.EMPTY_UTF8
      else {
        val sb = new java.lang.StringBuilder(
          ends(until - 1) - starts(from) + (until - from))
        var t = from
        while (t < until) {
          if (t > from) sb.append(' ')
          sb.append(s, starts(t), ends(t))
          t += 1
        }
        out(cIdx) = UTF8String.fromString(sb.toString)
      }
      cIdx += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkTokens =
    copy(child = newChild)
}

object ChunkTokens {
  def apply(c: Column, chunkTokens: Int, overlap: Int): Column =
    Exprs.column(new ChunkTokens(Exprs.expression(c), chunkTokens, overlap))
}
