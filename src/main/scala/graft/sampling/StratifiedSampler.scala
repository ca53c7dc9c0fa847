package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{PackWeightage, Weightage}

/**
 * Batch stratified sampling as a declarative Dataset transform.
 *
 * Semantics follow the reference samplers (snappy-aqp
 * `execution/StratifiedSamplerReservoir.scala:33-78`,
 * `execution/StratifiedSamplerCached.scala:39-120`,
 * options parsed at `execution/stratifiedSampling.scala:295-359`):
 *
 *  - The stratum key (QCS — "query column set") is an arbitrary list of
 *    projection expressions evaluated per row.
 *  - `fraction == 0` → fixed-size reservoir per stratum (`reservoirSize`
 *    rows, default 50 per `stratifiedSampling.scala:289-291`).
 *  - `fraction > 0`  → per-stratum target `max(reservoirSize,
 *    ceil(fraction · stratumSize))`, so small strata keep full
 *    representation while big strata are sampled at the fraction.
 *  - Every output row carries the hidden packed weight column
 *    ([[org.apache.spark.sql.graft.Weightage]]) encoding
 *    (keptRows, stratumTotal, keyHash) — weight = total/kept.
 *
 * Implementation is Spark-first rather than a port of the reference's
 * per-executor reservoir cache: rows are ranked inside each stratum by a
 * content-seeded xxhash64 (deterministic for a given seed + input), and the
 * `target` lowest-ranked rows are kept. This is one shuffle (hash partition
 * by stratum key) and both the per-stratum total and kept count are exact —
 * the reference's accuracy tests demand |kept − fraction·N| ≤ 2
 * (`SamplingAccuracySuite.scala:234-235`); this construction is exact by
 * design.
 *
 * Scale notes (100 TB): the rank is a per-stratum sort, so a single giant
 * stratum would land on one task. When `fraction` is small, `preFilter`
 * (default on) first computes per-stratum counts with a map-side-combined
 * `groupBy.count` (tiny shuffle), broadcasts them, and Bernoulli-prefilters
 * to ~`preFilterFactor × target + 50` rows by the same hash *before* the
 * window sort. The kept set is unchanged — the target-smallest hashes
 * survive any prefilter keeping all hashes below a threshold at ~margin× the
 * target quantile. The additive cushion covers tiny strata and the
 * multiplicative factor bounds the big-stratum shuffle at ~factor× the
 * sample size: a false cut needs Binomial(total, (f·t+50)/total) < t, i.e.
 * probability ≤ exp(−((f−1)t+50)²/(2(f·t+50))) ≤ e^−25 for every t ≥ 1 at
 * the default f = 2. AQE handles residual skew.
 */
object StratifiedSampler {

  /** Options mirroring the reference's sample-table OPTIONS map. */
  final case class Options(
      qcs: Seq[String],
      fraction: Double = 0.0,
      reservoirSize: Int = 50,
      seed: Long = 42L,
      preFilter: Boolean = true,
      preFilterFactor: Double = 2.0)

  final val WeightColumn: String = Weightage.WeightColumn

  private val K = "__graft_key__"
  private val R1 = "__graft_rank__"
  private val TOT = "__graft_total__"

  /** Above this per-stratum target, the Bernoulli prefilter cushion drops
    * from `factor × target` to `target + max(5% of target, 50)`: the
    * selected multiset is the `target` smallest hashes either way (the
    * prefilter only has to keep a SUPERSET of them), and at large targets
    * the count of sub-threshold hashes concentrates so tightly around its
    * mean (Chernoff: P[short by 5% at 10k+ expected] < e^-12, and it falls
    * exponentially from there) that a 2x cushion just doubles the volume
    * the rank pass materializes and sorts. Small strata keep the full
    * factor — there the cushion is what absorbs real variance. */
  private val CushionSwitch = 10000L

  /** Full prefilter numerator (target + cushion), the ONE definition both
    * the driver-side and column-side threshold formulas use. */
  private def cushioned(tgt: Long, factor: Double): Double =
    if (tgt >= CushionSwitch) tgt + math.max(math.ceil(tgt * 0.05), 50.0)
    else tgt * factor + 50.0

  def sample(df: DataFrame, opts: Options): DataFrame =
    sample(df, opts.qcs.map(expr), opts.fraction, opts.reservoirSize, opts.seed,
      opts.preFilter, opts.preFilterFactor, rankCols = Nil)

  /** Convenience: qcs by column name / SQL expression strings. */
  def sample(
      df: DataFrame,
      qcs: Seq[String],
      fraction: Double = 0.0,
      reservoirSize: Int = 50,
      seed: Long = 42L,
      rankCols: Seq[String] = Nil): DataFrame =
    sample(df, qcs.map(expr), fraction, reservoirSize, seed,
      preFilter = true, preFilterFactor = 2.0, rankCols = rankCols.map(col(_)))

  /**
   * Error-limit sampling (reference `StratifiedSamplerErrorLimit.scala:33-45`,
   * selection logic `stratifiedSampling.scala:418-440`): size each stratum so
   * the closed-form relative error of `errorColumn`'s mean stays under
   * `errorLimitPercent` at `confidence`:
   *
   *   n_s = ceil( (z · σ_s / (limit · |μ_s|))² ),  clamped to
   *         [reservoirSize, stratumTotal]
   *
   * Batch (two-pass) formulation of the reference's adaptive streaming
   * sampler: pass 1 is a map-side-combined per-stratum moment aggregation
   * (count/avg/variance — tiny shuffle), pass 2 the usual exact rank-select.
   * The inner expression is rounded to 6 decimals before `ceil` so the
   * target is robust to last-ulp differences.
   */
  def sampleWithErrorLimit(
      df: DataFrame,
      qcs: Seq[Column],
      errorColumn: Column,
      errorLimitPercent: Double,
      confidence: Double = 0.95,
      reservoirSize: Int = 50,
      seed: Long = 42L): DataFrame = {
    require(errorLimitPercent > 0, "errorLimitPercent must be > 0")
    val z = org.apache.spark.sql.graft.ClosedFormAggregate.zFactor(confidence)
    val limit = errorLimitPercent / 100.0

    val dataCols = df.columns.map(col).toSeq
    val key = if (qcs.isEmpty) lit(0) else struct(qcs: _*)
    val keyed = df
      .withColumn(K, key)
      .withColumn(R1, xxhash64(struct(dataCols: _*), lit(seed)))

    val stats = keyed.groupBy(col(K)).agg(
      count(lit(1)).as(TOT),
      avg(errorColumn).as("__graft_mu__"),
      coalesce(stddev_pop(errorColumn), lit(0.0)).as("__graft_sigma__"))
    val needed = ceil(round(
      pow(lit(z) * col("__graft_sigma__") /
        (lit(limit) * greatest(abs(col("__graft_mu__")), lit(1e-12))), 2.0),
      6)).cast("long")
    val targets = stats.withColumn("__graft_target__",
      least(greatest(lit(reservoirSize.toLong), needed), col(TOT)))
      .select(col(K).as(K + "c"), col(TOT), col("__graft_target__"))

    // same Bernoulli prefilter as the fraction path: cut the per-stratum
    // sort input to ~2x target + cushion before the exact rank
    val joined = keyed.join(broadcast(targets), col(K) <=> col(K + "c"), "inner")
    val p = least(lit(1.0),
      (col("__graft_target__") * lit(2.0) + lit(50.0)) / col(TOT).cast("double"))
    val threshold = (lit(2.0) * p - lit(1.0)) * lit(Long.MaxValue.toDouble)
    val pre = joined.filter(col(TOT) <= col("__graft_target__") ||
      col(R1).cast("double") < threshold)

    val ranked = pre
      .withColumn("__graft_rn__",
        row_number().over(Window.partitionBy(col(K)).orderBy(col(R1))))
      .filter(col("__graft_rn__") <= col("__graft_target__"))
      .withColumn("__graft_kept__",
        count(lit(1)).over(Window.partitionBy(col(K))))

    val keyHash = pmod(hash(col(K)), lit(256)).cast("int")
    ranked
      .withColumn(WeightColumn,
        PackWeightage(col("__graft_kept__"), col(TOT), keyHash))
      .select(dataCols :+ col(WeightColumn): _*)
  }

  /**
   * @param qcs stratum-key expressions (may be arbitrary projections, e.g.
   *            `hour(pickup_datetime)` — reference
   *            `sampling/ColumnFormatSamplingRelation.scala:170-229`)
   * @param rankCols columns the content-seeded rank hash reads. Default
   *            (empty) hashes EVERY column — always safe. Callers that
   *            know a row-distinguishing key (a primary key, an id) should
   *            pass it: the rank then forces only those columns into the
   *            scan's read schema, so a wide fact table samples off a
   *            narrow key scan instead of decoding every column of every
   *            row — at 100 TB the difference between hashing 3 ints and
   *            hashing a kilobyte of strings per row. CONTRACT: the
   *            columns must distinguish rows; if two rows collide on them,
   *            the winner among the tied ranks is layout-dependent and the
   *            sampled multiset loses its layout-independence guarantee
   *            (identical full rows remain interchangeable either way).
   */
  def sample(
      df: DataFrame,
      qcs: Seq[Column],
      fraction: Double,
      reservoirSize: Int,
      seed: Long,
      preFilter: Boolean,
      preFilterFactor: Double,
      // no default here: a second defaulted overload of `sample` is a
      // compile error; the string-qcs convenience overload carries it
      rankCols: Seq[Column]): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1]: $fraction")
    require(reservoirSize > 0 || fraction > 0, "need reservoirSize > 0 or fraction > 0")

    val dataCols = df.columns.map(col).toSeq
    val key = if (qcs.isEmpty) lit(0) else struct(qcs: _*)

    // fraction == 1.0 keeps every row with weight total/total = 1 — and
    // EVERY consumer of the packed weight depends on (kept, total) only
    // through quantities that are invariant when kept == total: the
    // decoded Horvitz–Thompson ratio total/kept (MapColumnToWeight,
    // BootstrapAggregate: x/x = 1.0 exactly in IEEE for any x > 0) and
    // the closed-form FPC factor R·(R−L)/(L−1) (ClosedFormAggregate:
    // exactly 0 for L == R ≥ 2; L == R == 1 skips as NaN — the same 0
    // contribution). So the per-stratum totals pass the old form paid —
    // one FULL extra scan of the base plus an aggregate pair and a
    // broadcast round PER QUERY, at 100 TB a second read of the fact
    // table — computed values whose every use cancels (guide §1.2:
    // don't compute things you throw away). The sentinel pack(1, 1,
    // keyHash) preserves every consumer's arithmetic (estimates, bounds,
    // errors, sample_count — see FullFractionWeightSpec) while making
    // the full-fraction "sample" a pure zero-job projection.
    // `spark.graft.sampler.fullFractionSentinel=off` restores the classic
    // totals-join plan for A/B.
    if (fraction >= 1.0) {
      val keyed = df.withColumn(K, key)
      val keyHash = pmod(hash(col(K)), lit(256)).cast("int")
      if (df.sparkSession.conf
          .get("spark.graft.sampler.fullFractionSentinel", "on") != "off") {
        return keyed
          .withColumn(WeightColumn, PackWeightage(lit(1L), lit(1L), keyHash))
          .select(dataCols :+ col(WeightColumn): _*)
      }
      val counts = keyed.groupBy(col(K)).agg(count(lit(1)).as(TOT))
      return keyed
        .join(broadcast(counts.withColumnRenamed(K, K + "c")),
          col(K) <=> col(K + "c"), "inner")
        .withColumn(WeightColumn, PackWeightage(col(TOT), col(TOT), keyHash))
        .select(dataCols :+ col(WeightColumn): _*)
    }

    // Content-seeded rank: deterministic for a fixed seed, uniform per row.
    // A single 64-bit hash ranks the rows; ties occur only for identical
    // rows (interchangeable — any winner yields the same sample) or 2^-64
    // cross-row collisions, the same determinism class as the reference
    // (which pins partition counts in tests because its per-partition RNG
    // order is config-dependent). A second independent hash would double the
    // dominant scan-side compute for no material gain. With `rankCols` the
    // hash reads only the caller's row-key columns — column pruning then
    // reaches the scan for queries that don't touch the other columns.
    val hashInput = if (rankCols.isEmpty) dataCols else rankCols
    val keyed = df
      .withColumn(K, key)
      .withColumn(R1, xxhash64(struct(hashInput: _*), lit(seed)))

    // ONE-PASS pure-reservoir mode (fraction == 0): the classic plan below
    // pays a per-stratum totals scan PLUS a full-width scan feeding the
    // prefilter + rank window. The selection criterion ("the reservoirSize
    // rows with the smallest content hash per stratum") and the weight
    // inputs (kept = min(reservoir, total), total) are both computable in
    // a single map-side-combined aggregate whose partial buffers hold at
    // most `reservoirSize` rows per stratum per task
    // ([[org.apache.spark.sql.graft.BoundedReservoirRows]]), so ONE scan
    // replaces two and the rank-window shuffle disappears — measured at
    // sf0.1 lineitem (ReservoirPhaseProbe): totals pass 0.34 s + hash scan
    // 0.31 s + join/window 0.18 s → one 0.35 s-class pass. The retained
    // multiset is IDENTICAL: ties on the full-width hash are identical
    // rows (or 2⁻⁶⁴ collisions), the same determinism class the rank
    // window documents above. Knob mirrors the candidate-join policy
    // (on/off; default on — off restores the classic two-pass plan).
    if (fraction == 0.0 && df.sparkSession.conf
        .get("spark.graft.sampler.onePassReservoir", "on") != "off") {
      import org.apache.spark.sql.graft.{BoundedReservoirRows, Exprs}
      val res = Exprs.column(BoundedReservoirRows(
        Exprs.expression(col(R1)),
        Exprs.expression(struct(dataCols: _*)),
        reservoirSize).toAggregateExpression())
      val keyHash = pmod(hash(col(K)), lit(256)).cast("int")
      val perStratum = keyed.groupBy(col(K)).agg(res.as("__graft_res__"))
      return perStratum
        .select(col(K), col("__graft_res__.total").as(TOT),
          explode(col("__graft_res__.rows")).as("__graft_row__"))
        .withColumn(WeightColumn,
          PackWeightage(least(lit(reservoirSize.toLong), col(TOT)), col(TOT),
            keyHash))
        .select(df.columns.toSeq.map(name =>
          col("__graft_row__").getField(name).as(name)) :+
          col(WeightColumn): _*)
    }

    def targetOf(total: Column): Column =
      if (fraction > 0.0) {
        least(greatest(lit(reservoirSize.toLong), ceil(total * lit(fraction))), total)
      } else least(lit(reservoirSize.toLong), total)

    // Attach per-stratum total; optionally Bernoulli-prefilter big strata
    // before the exact rank to keep the per-stratum sort input ~factor×target.
    // The prefilter applies to reservoir mode (fraction 0) too — there the
    // target is a constant, so the cut is deepest: a giant stratum shrinks to
    // ~2·reservoir+50 rows before the sort. Without the prefilter the totals
    // come from a window count, shuffling every row into one task per stratum.
    val usePrefilter =
      preFilter && (fraction == 0.0 || fraction * preFilterFactor < 0.9)

    // SUB-STRATUM PARALLEL RANK (the low-cardinality-QCS scale path): a
    // plain `row_number over (partitionBy K orderBy R1)` sorts each stratum
    // on ONE task, so 3 strata bound the whole job at 3 cores no matter the
    // cluster. R1 is a uniform 64-bit hash, so fixed equal-width ranges of
    // the hash value (top bits, monotone in the SIGNED order the rank
    // sorts by) split every stratum into balanced shards with no extra data
    // pass, and the exact global rank is `shard-local rank + exclusive sum
    // of lower-shard counts`. The selected multiset is IDENTICAL to the
    // one-task sort's: the same `target` smallest hashes per stratum
    // survive.
    //
    // The FULL-WIDTH content hash is computed exactly ONCE over the input:
    // the only eager job is a per-stratum totals count whose scan prunes to
    // the QCS columns (R1 never enters it), and the prefiltered survivors
    // — ~factor×target rows per stratum, a small multiple of the sample —
    // are evaluated once into executor storage shared by the offsets branch
    // and the rank pass, released after the caller's first action. The
    // shard offsets are exclusive sums of SURVIVOR counts, cumulated per
    // stratum in a bounded ≤64-row-per-stratum window and broadcast — no
    // driver collect. Survivor counts compose the same global rank the full
    // counts did: every shard below the threshold shard survives whole, and
    // shards above it have no survivors at all.
    //
    // Driver-side state stays bounded: this path engages only when the
    // stratum count is at most `maxOffsetStrata` (collected with a limit
    // guard); past it, per-stratum tasks already saturate any cluster and
    // the classic one-window plan is used unchanged. It is also SIZE-GATED:
    // the extra counts-collect job is pure overhead on an input small
    // enough that the one-task sort is trivial anyway — below the
    // threshold the classic plan runs (`spark.graft.sampler.shardRank`
    // on/off/auto overrides, mirroring the candidate-join policy).
    val maxOffsetStrata = 4096
    val B = "__graft_shard__"
    val shardBits = 58 // 64 shards: top 6 bits of the signed hash
    val shardRank = {
      val spark = df.sparkSession
      spark.conf.get("spark.graft.sampler.shardRank", "auto") match {
        case "on" => true
        case "off" => false
        case _ =>
          val threshold =
            math.max(8L * spark.sessionState.conf.autoBroadcastJoinThreshold,
              64L * 1024 * 1024)
          df.queryExecution.optimizedPlan.stats.sizeInBytes > BigInt(threshold)
      }
    }
    // fraction mode only: reservoir targets are small constants, so the
    // prefilter already cuts each stratum's sort input to ~2·reservoir+50
    // rows — a one-task sort of a few hundred rows needs no sharding
    if (usePrefilter && shardRank && fraction > 0.0) {
      // the ONLY eager job: per-stratum totals on a QCS-pruned scan — R1
      // (which would force every column into the read schema) never
      // enters this branch
      val totals = df.withColumn(K, key).groupBy(col(K))
        .agg(count(lit(1)).as(TOT))
        .limit(maxOffsetStrata + 1)
        .collect()
      if (totals.length <= maxOffsetStrata) {
        // ---- bucketed exact-rank path ----
        val keyType = keyed.schema.find(_.name == K).get.dataType
        val targetRows = totals.map { r =>
          val tot = r.getLong(1)
          val tgt = math.min(math.max(reservoirSize.toLong,
            math.ceil(tot * fraction).toLong), tot)
          val p = math.min(1.0, cushioned(tgt, preFilterFactor) / tot)
          val threshold = (2.0 * p - 1.0) * Long.MaxValue.toDouble
          org.apache.spark.sql.Row(r.get(0), tot, tgt, threshold)
        }.toSeq
        val spark = df.sparkSession
        val targetsSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(K + "c", keyType),
          org.apache.spark.sql.types.StructField(TOT,
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("__graft_target__",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("__thr__",
            org.apache.spark.sql.types.DoubleType)))
        val targets = broadcast(spark.createDataFrame(
          new java.util.ArrayList(scala.jdk.CollectionConverters
            .SeqHasAsJava(targetRows).asJava), targetsSchema))
        // PUSH the prefilter BELOW the targets join: the thresholds are
        // driver-known (they were just computed from the collected
        // totals), so for a small stratum count the per-stratum cut can be
        // a literal predicate sitting directly on the scan — measured at
        // sf10u (60M rows, 3 strata), letting all 60M rows ride the
        // broadcast join just to evaluate this filter cost ~6 s of a 17 s
        // sample; the literal pre-cut drops the join input to
        // ~cushion×target rows. The predicate reproduces the join-side
        // filter EXACTLY (same thresholds, same keep-all branch), so the
        // selected multiset is unchanged and the join-side filter stays on
        // as a free re-check. Beyond `maxPredStrata` strata a giant
        // OR-chain would bloat codegen for no win (many strata ⇒ the join
        // pass is not the bottleneck) — fall back to join-then-filter; a
        // key field type Literal.create can't carry falls back too.
        val maxPredStrata = 64
        val preCut: Option[Column] =
          if (totals.length > maxPredStrata) None
          else try {
            val keyFields = keyed.schema(K).dataType match {
              case s: org.apache.spark.sql.types.StructType => s.fields.toSeq
              case _ => Seq.empty
            }
            val parts = targetRows.map { r =>
              val tot = r.getLong(1)
              val tgt = r.getLong(2)
              val thr = r.getDouble(3)
              val keyEq: Column =
                if (keyFields.isEmpty) lit(true)
                else {
                  val kr = r.get(0).asInstanceOf[org.apache.spark.sql.Row]
                  keyFields.zipWithIndex.map { case (f, i) =>
                    col(K).getField(f.name) <=> org.apache.spark.sql.graft
                      .Exprs.column(org.apache.spark.sql.catalyst.expressions
                        .Literal.create(kr.get(i), f.dataType))
                  }.reduce(_ && _)
                }
              if (tot <= tgt) keyEq
              else keyEq && col(R1).cast("double") < lit(thr)
            }
            Some(parts.reduce(_ || _))
          } catch {
            // expected: Literal.create cannot carry a key field's type
            // (its converter failures span exception classes, so the
            // catch stays broad) — but the fallback must never be SILENT:
            // a genuine bug (schema drift between keyed and targets)
            // would otherwise just disable the measured ~6 s/pass
            // optimization with no signal it stopped engaging
            case scala.util.control.NonFatal(e) =>
              org.slf4j.LoggerFactory.getLogger(StratifiedSampler.getClass)
                .warn("StratifiedSampler: literal pre-cut disabled, " +
                  s"falling back to join-side filter only: $e")
              None
          }
        // arithmetic shift of the signed hash: shard index is monotone in
        // the signed order the rank sorts by
        val shardCol = (shiftright(col(R1), shardBits) + lit(32)).cast("int")
        // ONE full-width scan computes the content hash; the survivors
        // (~factor×target per stratum) are materialized so the offsets
        // branch and the rank pass read the same snapshot instead of
        // re-scanning and re-hashing the whole input
        val preCutKeyed = preCut.fold(keyed)(keyed.filter)
        val survivors0 = preCutKeyed.withColumn(B, shardCol)
          .join(targets, col(K) <=> col(K + "c"), "inner")
          .filter(col(TOT) <= col("__graft_target__") ||
            col(R1).cast("double") < col("__thr__"))
          .drop(K + "c")
        val (survivors, survivorsRdd) = org.apache.spark.sql.graft.Plans
          .materializeWithRdd(spark, survivors0)
        // exclusive per-(stratum, shard) offsets from SURVIVOR counts,
        // cumulated inside the caller's action (≤64 rows per stratum in
        // the window) and broadcast back — these equal the full-count
        // offsets: a shard below the per-stratum threshold shard survives
        // whole, and a shard above it has no survivors
        val survCounts = survivors
          .groupBy(col(K).as(K + "o"), col(B).as(B + "o"))
          .agg(count(lit(1)).as("__cnt__"))
        val offsets = broadcast(survCounts
          .withColumn("__off__", coalesce(
            sum(col("__cnt__")).over(Window.partitionBy(col(K + "o"))
              .orderBy(col(B + "o"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col(K + "o"), col(B + "o"), col("__off__")))
        val ranked = survivors
          .join(offsets, col(K) <=> col(K + "o") && col(B) === col(B + "o"),
            "inner")
          .withColumn("__graft_rn__", row_number()
            .over(Window.partitionBy(col(K), col(B)).orderBy(col(R1))) +
            col("__off__"))
          .filter(col("__graft_rn__") <= col("__graft_target__"))
        // exact kept count WITHOUT a window over the ranked rows: the rank
        // keeps exactly min(target, survivorsPerStratum) rows, and the
        // per-stratum survivor totals are one tiny aggregation over the
        // SAME ≤64-rows-per-stratum counts frame the offsets use — the
        // count-only window this replaces shuffled every sampled row into
        // one task per stratum (at 3 strata × 2M-row targets, 3 serial
        // tasks over 6M rows for a number already known from ≤192 rows)
        val keptPerK = broadcast(survCounts
          .groupBy(col(K + "o").as(K + "k"))
          .agg(sum(col("__cnt__")).as("__surv__")))
        val kept = ranked
          .join(keptPerK, col(K) <=> col(K + "k"), "inner")
          .withColumn("__graft_kept__",
            least(col("__graft_target__"), col("__surv__")))
        val keyHash = pmod(hash(col(K)), lit(256)).cast("int")
        val out = kept
          .withColumn(WeightColumn,
            PackWeightage(col("__graft_kept__"), col(TOT), keyHash))
          .select(dataCols :+ col(WeightColumn): _*)
        org.apache.spark.sql.graft.Plans
          .releaseAfterFirstUse(spark, survivorsRdd)
        return out
      }
      // else: fall through to the classic plan (strata already saturate
      // the cluster; the finer counts pass is discarded)
    }

    val withTotal: DataFrame =
      if (usePrefilter) {
        val counts = keyed.groupBy(col(K)).agg(count(lit(1)).as(TOT))
        // null-safe equality: QCS values may be null and must join to their count
        val joined = keyed.join(broadcast(counts.withColumnRenamed(K, K + "c")),
          col(K) <=> col(K + "c"), "inner").drop(K + "c")
        val tgt = targetOf(col(TOT))
        // column mirror of cushioned() — keep the two bit-identical
        val cushionedTgt = when(tgt >= lit(CushionSwitch),
          tgt + greatest(ceil(tgt * lit(0.05)), lit(50.0)))
          .otherwise(tgt * lit(preFilterFactor) + lit(50.0))
        val p = least(lit(1.0), cushionedTgt / col(TOT))
        // xxhash64 is uniform over the full signed-long range:
        // P(h < (2p−1)·MaxLong) = p; p == 1 keeps everything
        val threshold = (lit(2.0) * p - lit(1.0)) * lit(Long.MaxValue.toDouble)
        joined.filter(col(TOT) <= tgt || col(R1).cast("double") < threshold)
      } else {
        keyed.withColumn(TOT, count(lit(1)).over(Window.partitionBy(col(K))))
      }

    val prefiltered = usePrefilter
    val ranked = withTotal
      .withColumn("__graft_rn__",
        row_number().over(Window.partitionBy(col(K)).orderBy(col(R1))))
      .withColumn("__graft_target__", targetOf(col(TOT)))
      .filter(col("__graft_rn__") <= col("__graft_target__"))

    // Without a prefilter, rank selection keeps exactly min(target, total)
    // rows — no extra pass needed. After a prefilter the kept count can (with
    // astronomically small probability) fall short of the target, so count it
    // exactly; this extra window runs on already-sampled data that is already
    // partitioned by the key.
    val kept =
      if (prefiltered) {
        ranked.withColumn("__graft_kept__",
          count(lit(1)).over(Window.partitionBy(col(K))))
      } else {
        ranked.withColumn("__graft_kept__",
          least(col("__graft_target__"), col(TOT)))
      }

    val keyHash = pmod(hash(col(K)), lit(256)).cast("int")
    kept
      .withColumn(WeightColumn,
        PackWeightage(col("__graft_kept__"), col(TOT), keyHash))
      .select(dataCols :+ col(WeightColumn): _*)
  }
}
