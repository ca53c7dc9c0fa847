package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.expr

import graft.sampling.StratifiedSampler

/** Thrown at a publish commit point when the store's fence
 * (`_graft.fence`) has moved past the holder's acquisition epoch — the
 * path lock was lease-broken while this process was stalled, and landing
 * the write would interleave with the successor's. The publish is
 * abandoned; any artifacts the zombie landed before detection carry its
 * stale epoch and are quarantined by readers
 * ([[GraftSession.readSample]]). */
class FencedLockException(msg: String) extends IllegalStateException(msg)

/** Metadata + materialized plan of one registered sample table
 * (reference `sql/sampling/ColumnFormatSamplingRelation.scala:50-168`). */
final case class SampleInfo(
    name: String,
    baseName: String,
    basePlan: LogicalPlan,
    sampleDf: DataFrame,
    qcs: Seq[String],
    fraction: Double,
    reservoirSize: Int,
    persistPath: Option[String] = None)

/**
 * Per-SparkSession AQP state: the sample-table catalog plus session default
 * error/confidence/behavior (reference keeps these in
 * `SnappyAQPSessionState`; config keys mirror `io.snappydata.Property` —
 * SURVEY.md §4).
 */
final class GraftState {
  val samples: TrieMap[String, SampleInfo] = TrieMap.empty

  /** Resolve a sample name to its registered key, matching temp-view
   * case-insensitivity (`MySample` finds a sample registered as
   * `mysample`); exact-case match wins when both exist. */
  def resolveSample(name: String): Option[String] =
    if (samples.contains(name)) Some(name)
    else samples.keys.find(_.equalsIgnoreCase(name))
  val topks: TrieMap[String, Any] = TrieMap.empty
  /** TopK name → persist path (sketch snapshot re-saved on each append). */
  val topkPaths: TrieMap[String, String] = TrieMap.empty
  /** TopK name → base-table name (stream-dependent population routing). */
  val topkBases: TrieMap[String, String] = TrieMap.empty
  /** SQL-declared stream tables (`CREATE STREAM TABLE`). */
  val streams: TrieMap[String, graft.streaming.StreamTableDef] = TrieMap.empty
  /** Running per-stream populator queries (`STREAMING START`). */
  val activeStreams: TrieMap[String, org.apache.spark.sql.streaming.StreamingQuery] =
    TrieMap.empty
  /** Micro-batch trigger interval (`STREAMING INIT <n> SECS`). */
  @volatile var streamingBatchMs: Long = 1000L

  /** (sample, stream) → highest applied micro-batch id for IN-MEMORY
   * samples: a same-JVM STOP→START replays the last uncommitted batch
   * (stop() interrupts between populate and the checkpoint's offset
   * commit), and without this fence the replay double-appends. Path-backed
   * samples persist their watermark in the registry meta instead
   * ([[GraftSession.appendToSampleForBatch]]); in-memory TopKs keep theirs
   * inside [[graft.topk.TopKState]]. */
  val streamSampleBatches: TrieMap[(String, String), Long] = TrieMap.empty

  /** Sample chosen by the last AQP rewrite in this session (None when the
   * query ran on base) — diagnostic hook for selection tests, the analogue
   * of the reference's `AQPRules.setTestHookStoreAQPInfo`
   * (`AQPRules.scala:48`). */
  @volatile var lastChosenSample: Option[String] = None

  /** Samples registered on the given base table. */
  def samplesOn(baseName: String): Seq[SampleInfo] =
    samples.values.filter(_.baseName.equalsIgnoreCase(baseName)).toSeq

  /**
   * Best sample for a query QCS (grouping + filter columns), per the
   * reference's ranking — see [[GraftState.rank]] for the full tiering
   * (`QueryProcessingRules.scala:412-501`).
   */
  def pickSample(baseName: String, queryQcs: Seq[String],
      groupbyQcs: Seq[String] = Nil): Option[SampleInfo] =
    GraftState.rank(samplesOn(baseName), queryQcs, groupbyQcs)
}

object GraftState {
  private val states = new java.util.WeakHashMap[SparkSession, GraftState]()

  def of(spark: SparkSession): GraftState = states.synchronized {
    var s = states.get(spark)
    if (s == null) { s = new GraftState; states.put(spark, s) }
    s
  }

  /** QCS ranking over an arbitrary candidate pool (samples registered on
   * plan-equal bases all compete — different views over the same data are
   * interchangeable). Mirrors the reference's tiering
   * (`QueryProcessingRules.scala:412-501`): a table whose QCS equals the
   * GROUP BY columns alone wins outright, then an exact query-QCS
   * (groupby+filter) match, then supersets by largest fraction alone
   * (:462-478 — no smallest-QCS preference), then minimum
   * |queryQCS \ tableQCS| mismatch — tables with EXTRA stratum columns
   * still compete in this tier (:443-455) — ties by fraction. */
  def rank(candidates: Seq[SampleInfo], queryQcs: Seq[String],
      groupbyQcs: Seq[String] = Nil): Option[SampleInfo] = {
    if (candidates.isEmpty) return None
    val q = queryQcs.map(_.toLowerCase).toSet
    val g = groupbyQcs.map(_.toLowerCase).toSet
    def sampleQcs(s: SampleInfo) = s.qcs.map(_.toLowerCase).toSet

    val gExact = candidates.filter(s => g.nonEmpty && sampleQcs(s) == g)
    if (gExact.nonEmpty) return Some(gExact.maxBy(_.fraction))

    val exact = candidates.filter(s => sampleQcs(s) == q && q.nonEmpty)
    if (exact.nonEmpty) return Some(exact.maxBy(_.fraction))

    val supersets = candidates.filter(s => q.nonEmpty && q.subsetOf(sampleQcs(s)))
    if (supersets.nonEmpty) return Some(supersets.maxBy(_.fraction))

    val overlapping = candidates.filter(s => sampleQcs(s).intersect(q).nonEmpty)
    if (overlapping.nonEmpty) {
      val maxOverlap = overlapping.map(s => sampleQcs(s).intersect(q).size).max
      return Some(overlapping.filter(s => sampleQcs(s).intersect(q).size == maxOverlap)
        .maxBy(_.fraction))
    }

    Some(candidates.maxBy(_.fraction))
  }
}

/**
 * Public session facade — the DataFrame-API entry point of the engine
 * (reference entry point B/C, SURVEY.md §3: `SnappySession.createSampleTable`
 * / `sample` / `queryTopK`).
 */
class GraftSession(val spark: SparkSession) {
  val state: GraftState = GraftState.of(spark)

  // runtime install of error functions + HAC planning strategy, so the
  // engine works on a stock session (no spark.sql.extensions needed)
  org.apache.spark.sql.graft.Plans.install(spark)

  /**
   * SQL entry point with the AQP surface: trailing `WITH ERROR e
   * [CONFIDENCE c] [BEHAVIOR 'b']`, `CREATE SAMPLE TABLE`, error functions
   * `absolute_error/relative_error/lower_bound/upper_bound(alias)`
   * (reference entry points A and C — SURVEY.md §3). Other SQL passes
   * through unchanged.
   */
  def sql(text: String): DataFrame = {
    import org.apache.spark.sql.graft._
    val parser = new AqpParser(spark.sessionState.sqlParser, Some(spark))
    parser.parsePlan(text) match {
      // AQP DDL nodes are runnable commands — run them eagerly, exactly as
      // Spark's command path does under the extensions wiring (other
      // commands fall through to ordinary execution below)
      case cmd @ (_: CreateSampleTableNode | _: CreateSampleTableAsNode |
                  _: CreateTopkTableNode | _: DropSampleTableNode |
                  _: DropTopkTableNode | _: CreateStreamTableNode |
                  _: DropStreamTableNode | _: StreamingControlNode |
                  _: InsertIntoSampleNode | _: InsertIntoTopkNode) =>
        cmd.asInstanceOf[org.apache.spark.sql.execution.command.RunnableCommand]
          .run(spark)
        spark.emptyDataFrame
      case show: ShowAqpTablesNode =>
        // row-producing command: surface the listing as a DataFrame
        val schema = org.apache.spark.sql.types.StructType(show.output.map(a =>
          org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable)))
        spark.createDataFrame(
          new java.util.ArrayList(scala.jdk.CollectionConverters
            .SeqHasAsJava(show.run(spark)).asJava), schema)
      case plan =>
        val analyzed = Plans.analyzed(Plans.ofRows(spark, plan))
        Plans.ofRows(spark, AqpRewrite(spark)(analyzed))
    }
  }

  /** Register a continuous query over a declared stream table (reference
   * `SnappyStreamingContext.registerCQ` — `SELECT ... FROM <stream>
   * WINDOW (DURATION n unit [, SLIDE n unit])`). Returns an unstarted
   * handle; `foreachWindow`/`saveTo` starts it. */
  def registerCQ(cqSql: String): graft.streaming.ContinuousQuery =
    graft.streaming.StreamCq.registerCQ(this, cqSql)

  /** Session defaults — `spark.sql.aqp.{error,confidence,behavior}`. */
  def defaultError: Double = spark.conf.get("spark.sql.aqp.error", "0.2").toDouble
  def defaultConfidence: Double = spark.conf.get("spark.sql.aqp.confidence", "0.95").toDouble
  def defaultBehavior: String = spark.conf.get("spark.sql.aqp.behavior", "do_nothing")
  def numBootstrapTrials: Int = spark.conf.get("spark.sql.aqp.numBootstrapTrials", "100").toInt

  /**
   * Create + register a stratified sample table over a registered base table
   * (`CREATE SAMPLE TABLE name ON base OPTIONS(qcs ..., fraction ...,
   * strataReservoirSize ...)` — reference `sql/snappyAQPParsers.scala:77-103`,
   * `command/CreateSampleTableCommand.scala:27-48`).
   *
   * `persistPath`: when set, the sample is written as parquet there and
   * scanned from disk (the scale path — the reference flushes into its
   * column store); when empty the sample is cached in memory (test path).
   */
  def createSampleTable(
      name: String,
      baseName: String,
      qcs: Seq[String],
      fraction: Double = 0.0,
      reservoirSize: Int = 50,
      seed: Long = 42L,
      persistPath: Option[String] = None): DataFrame = {
    val base = spark.table(baseName)
    val sampled = StratifiedSampler.sample(base, qcs.map(expr), fraction,
      reservoirSize, seed, preFilter = true, preFilterFactor = 2.0, rankCols = Nil)
    registerSample(name, baseName, base, sampled, qcs, fraction, reservoirSize,
      persistPath)
  }

  /** `CREATE SAMPLE TABLE` options path: supports the full reference option
   * set — `qcs`, `fraction`, `strataReservoirSize`, `seed`, `path`,
   * `timeSeriesColumn`/`timeInterval` (time-slot strata —
   * `StratifiedSamplerCached.scala:96-120`), and
   * `errorLimitColumn`/`errorLimitPercent`/`confidence`
   * (`StratifiedSamplerErrorLimit`). */
  def createSampleTableFromOptions(name: String, baseName: String,
      opts: Map[String, String]): DataFrame = {
    val base = spark.table(baseName)
    val (sampled, qcs, fraction, reservoirSize) =
      GraftSession.sampleByOptions(base, opts)
    registerSample(name, baseName, base, sampled, qcs, fraction, reservoirSize,
      opts.get("path"),
      opts.get("partitionby").map(_.split(",").map(_.trim).toSeq).getOrElse(Nil))
  }

  private def registerSample(name: String, baseName: String, base: DataFrame,
      sampled: DataFrame, qcs: Seq[String], fraction: Double,
      reservoirSize: Int, persistPath: Option[String],
      partitionBy: Seq[String] = Nil): DataFrame = {
    val sampleDf = persistPath match {
      case Some(path) =>
        // `partitionBy` (typically the QCS or the base table's partition
        // columns) gives the persisted sample hive-style partition dirs, so
        // stratum-filtered queries prune files instead of scanning the whole
        // sample (reference co-partitions samples with the base —
        // `ColumnFormatSamplingRelation.scala:126-133`)
        val w = sampled.write.mode("overwrite")
        (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
          .parquet(path)
        GraftSession.writeSampleMeta(path, baseName, qcs, fraction,
          reservoirSize, spark.sessionState.newHadoopConf())
        spark.read.parquet(path)
      case None if fraction < 1.0 =>
        // cached lazily: the sampler is content-hash deterministic, so even
        // an unmaterialized recompute yields the identical sample — the
        // cache only avoids re-sampling on repeated queries
        sampled.persist()
      case None =>
        // fraction 1.0: the "sample" is the base plus a broadcast-joined
        // weight column — recomputing costs about as much as a cache hit
        // and avoids materializing a full copy of the table
        sampled
    }
    sampleDf.createOrReplaceTempView(name)
    state.samples.put(name, SampleInfo(name, baseName,
      base.queryExecution.analyzed, sampleDf, qcs, fraction, reservoirSize,
      persistPath))
    sampleDf
  }

  /** Batch insert path (reference `ColumnFormatSamplingRelation.insert/append`,
   * `sampling/ColumnFormatSamplingRelation.scala:253-340`): sample the new
   * rows per stratum and append them to the registered sample table. Weights
   * encode the new batch's stratum totals, so weighted estimates cover base
   * plus appended data. */
  def appendToSample(rawName: String, df: DataFrame, seed: Long = 43L): DataFrame = {
    val name = state.resolveSample(rawName).getOrElse(
      throw new IllegalArgumentException(s"No sample table named $rawName"))
    val info = state.samples(name)
    val sampled = StratifiedSampler.sample(df, info.qcs.map(expr), info.fraction,
      info.reservoirSize, seed, preFilter = true, preFilterFactor = 2.0, rankCols = Nil)
    val merged = info.persistPath match {
      case Some(path) =>
        // concurrent appends from two sessions serialize on the path lock —
        // appends only add files, so serialized appends all land (no lost
        // update); the staged publish re-validates the fence AFTER the
        // distributed write, closing the job-duration window a frozen
        // appender could sleep through (see [[GraftSession.publishAppend]])
        GraftSession.withPathLock(spark, path) {
          GraftSession.assertStoreFence(spark, path)
          GraftSession.publishAppend(spark, path, sampled)
        }
        spark.catalog.refreshByPath(path)
        spark.read.parquet(path)
      case None if info.fraction == 0.0 =>
        // Pure-reservoir sample (bounded by construction: strata ×
        // reservoir rows): materialize the merged sample AND cut its
        // lineage. The lazy persist()-then-unpersist-predecessor form
        // below drops the only evaluated copy of the chain BEFORE the new
        // union is ever computed, so each append's consumers re-run every
        // prior append's sampler from scratch, and the union's LOGICAL
        // plan grows by a full sampler subtree per append (re-analysis +
        // recompute) — measured on q51's 2-insert gate as a monotone
        // per-repeat ramp, 1.0 → 2.2 s over 6 repeats, rising GC. An
        // eager localCheckpoint pins the (tiny) rows and replaces the
        // plan with a flat scan, so appends stay O(one sampler) no matter
        // how many preceded: the same gate flattens to 0.55 s per repeat.
        // The superseded checkpoint's storage is released by the
        // ContextCleaner once the registry swap below drops the old
        // frame. fraction > 0 samples scale with the base table — for
        // them an eager per-append copy measured 3–5x worse (q38's
        // full-fraction append: 0.33 → 0.89–1.16 s), so they keep the
        // lazy-persist form.
        //
        // DURABILITY GATE (r16 advice): localCheckpoint stores blocks on
        // executors ONLY and severs lineage — in cluster mode an executor
        // loss (or a dynamic-allocation decommission) would make the
        // in-memory sample table permanently unreadable, where the
        // persist() form recomputed from lineage. Local masters run
        // blocks in the driver JVM (nothing to lose short of the whole
        // app), so the lineage cut is safe exactly there; non-local
        // sessions keep the recomputable persist-with-lineage form and
        // pay the plan-growth cost the checkpoint exists to remove
        // (bounded: reservoir samples are tiny, and cluster deployments
        // normally use path-backed samples, the branch above).
        if (spark.sparkContext.isLocal) {
          val m = info.sampleDf.unionByName(sampled).localCheckpoint(true)
          info.sampleDf.unpersist(blocking = false)
          m
        } else {
          val m = info.sampleDf.unionByName(sampled)
          m.persist()
          m.count() // materialize BEFORE dropping the predecessor's copy
          info.sampleDf.unpersist(blocking = false)
          m
        }
      case None =>
        val m = info.sampleDf.unionByName(sampled)
        m.persist()
        info.sampleDf.unpersist()
        m
    }
    merged.createOrReplaceTempView(name)
    state.samples.put(name, info.copy(sampleDf = merged))
    merged
  }

  /** Re-attach a persisted sample (written with `OPTIONS(path ...)`) in a
   * fresh session without resampling: reads the registry metadata stored
   * next to the parquet. The base table/view must already be registered
   * under its original name so query routing can match it. */
  def attachSampleTable(name: String, path: String): DataFrame = {
    val (baseName, qcs, fraction, reservoirSize) =
      GraftSession.readSampleMeta(path, spark.sessionState.newHadoopConf())
        .getOrElse(
        throw new IllegalArgumentException(
          s"No sample registry metadata (${GraftSession.MetaFile}) under $path"))
    val sampleDf = spark.read.parquet(path)
    sampleDf.createOrReplaceTempView(name)
    state.samples.put(name, SampleInfo(name, baseName,
      spark.table(baseName).queryExecution.analyzed, sampleDf, qcs, fraction,
      reservoirSize, Some(path)))
    sampleDf
  }

  /** Snapshot read of a sample table with READ-YOUR-WRITES consistency
   * through crash-recovery republication — the strong-reader companion to
   * the weaker plain-`spark.read.parquet` contract documented at
   * [[appendToSampleForBatch]].
   *
   * The weaker contract's window: recovering a crashed batch runs
   * delete-by-prefix → stage → rename under the path lock, and a plain
   * reader that lists between the delete and the renames transiently
   * MISSES the recovering batch's rows (or fails outright when a listed
   * file vanishes mid-read). This reader closes the window by taking the
   * SAME lock for the file LISTING only: every store mutation happens
   * under that lock and every published file is renamed into place
   * complete, so an under-lock listing is a consistent one-copy snapshot
   * — mid-recovery states (after the delete, before the renames) are
   * unobservable by construction. The Spark job then runs over that
   * pinned file list WITHOUT the lock (holding a cross-JVM lock across a
   * distributed job would stall writers): files of ACKNOWLEDGED batches
   * are never deleted afterwards, and a pinned unacknowledged leftover
   * that a concurrent recovery deletes before the job reads it surfaces
   * as a read failure — retried with a fresh snapshot (bounded; each
   * retry re-lists under the lock, so it only loops while recoveries are
   * actively churning the same batch).
   *
   * In-memory samples return the registered DataFrame unchanged. */
  def readSample(rawName: String, maxRetries: Int = 5): DataFrame = {
    val name = state.resolveSample(rawName).getOrElse(
      throw new IllegalArgumentException(s"No sample table named $rawName"))
    val info = state.samples(name)
    info.persistPath match {
      case None => info.sampleDf
      case Some(path) =>
        val conf = spark.sessionState.newHadoopConf()
        // `stream-<key>-b<id>-<k>[.e<epoch>].parquet`: the fence epoch a
        // streaming batch publish was stamped with (absent = pre-fence, 0)
        val streamFilePat = "^(stream-.+-b[0-9]+-)[0-9]+(?:\\.e([0-9]+))?\\.parquet$".r
        def snapshotFiles(): Seq[String] =
          GraftSession.withPathLock(spark, path) {
            val dir = new org.apache.hadoop.fs.Path(path)
            val fs = dir.getFileSystem(conf)
            if (!fs.exists(dir)) Seq.empty
            else {
              val listed = fs.listStatus(dir).toSeq.collect {
                case s if s.isFile &&
                  s.getPath.getName.endsWith(".parquet") &&
                  !s.getPath.getName.startsWith(".") &&
                  !s.getPath.getName.startsWith("_") => s.getPath
              }
              // store-level fencing, reader side: a batch published twice
              // under DIFFERENT fence epochs means a lease-broken zombie
              // landed files past the commit-point checks (the successor's
              // recovery republished the same batch under a newer epoch).
              // Only the newest epoch's files are the batch; older ones are
              // quarantined under a dot prefix — invisible to this snapshot
              // AND to plain spark.read.parquet(path) readers — never
              // deleted (they are the forensic record; the next publish of
              // that batch sweeps them with its other leftovers).
              val epochOf = listed.flatMap { p =>
                p.getName match {
                  case streamFilePat(pf, e) =>
                    Some(p -> (pf, if (e == null) 0L else e.toLong))
                  case _ => None
                }
              }.toMap
              val maxEpoch = epochOf.values.groupBy(_._1)
                .map { case (pf, vs) => pf -> vs.map(_._2).max }
              listed.filter { p =>
                epochOf.get(p) match {
                  case Some((pf, e)) if e < maxEpoch(pf) =>
                    val q = new org.apache.hadoop.fs.Path(dir,
                      s".fenced-${p.getName}")
                    GraftSession.log
                      .warn(s"readSample: quarantining $p — published " +
                        s"under superseded fence epoch $e (batch's " +
                        s"current epoch: ${maxEpoch(pf)}); a lease-broken " +
                        "holder's zombie write")
                    // best-effort: EXCLUDING the file is the correctness
                    // half; the rename only extends the protection to
                    // plain readers, and a store this session cannot
                    // write to must still be readable
                    try fs.rename(p, q)
                    catch { case _: java.io.IOException => () }
                    false
                  case _ => true
                }
              }.map(_.toString)
            }
          }
        var attempt = 0
        var out: Option[DataFrame] = None
        while (out.isEmpty) {
          attempt += 1
          val files = snapshotFiles()
          if (files.isEmpty) out = Some(info.sampleDf.limit(0))
          else {
            // schema inference at read() touches only SOME footers, so a
            // pinned file deleted by a concurrent recovery does not
            // reliably surface here — verify every pinned name exists
            // after the read() so churn is caught inside THIS retry
            // budget, not as a task failure in the caller's job. The
            // check-then-run gap stays (a delete can land after the
            // check), but a recovery republishes a churned batch under
            // the SAME deterministic file names with the same replayed
            // content, so the pinned names cannot silently lose rows —
            // the residual worst case is a LOUD task-level read failure
            // for the caller to retry, exactly the documented contract.
            try {
              val df = spark.read.parquet(files: _*)
              val fs = new org.apache.hadoop.fs.Path(path)
                .getFileSystem(conf)
              val vanished = files.filterNot(f =>
                fs.exists(new org.apache.hadoop.fs.Path(f)))
              if (vanished.isEmpty) out = Some(df)
              else if (attempt > maxRetries) {
                throw new IllegalStateException(
                  s"readSample($rawName): pinned files kept vanishing " +
                    s"under concurrent recovery after $maxRetries " +
                    s"retries (last: ${vanished.head})")
              } else spark.catalog.refreshByPath(path)
            } catch {
              case scala.util.control.NonFatal(_) if attempt <= maxRetries =>
                spark.catalog.refreshByPath(path)
            }
          }
        }
        out.get
    }
  }

  def dropSampleTable(name: String): Unit = {
    state.resolveSample(name).flatMap(state.samples.remove).foreach { info =>
      info.sampleDf.unpersist()
      spark.catalog.dropTempView(info.name)
      // clear the in-memory replay fences keyed by this sample: a
      // same-name sample recreated over a FRESH streaming query (whose
      // batch ids restart at 0) must not inherit the old watermark and
      // silently drop its early batches
      val key = info.name.toLowerCase
      state.streamSampleBatches.keys
        .filter(_._1 == key).foreach(state.streamSampleBatches.remove)
    }
  }

  /** Ad-hoc stratified sample of any DataFrame (reference
   * `SnappyContextAQPFunctions.scala:375-382`). */
  def sample(df: DataFrame, qcs: Seq[String], fraction: Double = 0.0,
      reservoirSize: Int = 50, seed: Long = 42L): DataFrame =
    StratifiedSampler.sample(df, qcs, fraction, reservoirSize, seed)

  /**
   * Error statistics of an aggregate over a sampled DataFrame (one produced
   * by [[sample]] — must carry the weight column): estimate, absolute and
   * relative error, confidence bounds and sample count, per group if
   * `groupBy` columns are given. The DataFrame face of the reference's
   * `SampleDataFrameContract.errorStats`
   * (`sql/SampleDataFrameContractImpl.scala:33-80`).
   */
  def errorStats(sampledDf: DataFrame, column: String,
      aggType: String = "sum", confidence: Double = 0.95,
      groupBy: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.functions.col
    import graft.functions._
    val aggCol = aggType.toLowerCase match {
      case "sum" => approx_sum(col(column), col(weightColumn), confidence)
      case "avg" | "average" => approx_avg(col(column), col(weightColumn), confidence)
      case "count" => approx_count(col(column), col(weightColumn), confidence)
      case other => throw new IllegalArgumentException(
        s"errorStats supports sum/avg/count, got $other")
    }
    val grouped =
      if (groupBy.isEmpty) sampledDf.groupBy()
      else sampledDf.groupBy(groupBy.map(col): _*)
    grouped.agg(aggCol.as("__s__"))
      .select(groupBy.map(col) ++ Seq(
        estimate(col("__s__")).as("estimate"),
        absolute_error(col("__s__")).as("absolute_error"),
        relative_error(col("__s__")).as("relative_error"),
        lower_bound(col("__s__")).as("lower_bound"),
        upper_bound(col("__s__")).as("upper_bound"),
        col("__s__.sample_count").as("sample_count")): _*)
  }

  // ---------------------------------------------------------------------------
  // TopK tables (reference entry point C — `CREATE TOPK TABLE`, `queryTopK`:
  // `SnappyContextAQPFunctions.scala:143-179`, `sql/topk/TopKRelation.scala`)
  // ---------------------------------------------------------------------------

  /** Create + populate a TopK structure over a registered table. */
  def createTopK(name: String, baseName: String,
      options: Map[String, String]): graft.topk.TopKState =
    createTopK(name, baseName, options, lockHeld = false)

  /** [[createTopK]] for callers that already hold the path lock
   * ([[GraftSession.withPathLock]] is a file lock — NOT reentrant): the
   * CREATE TOPK TABLE command must decide attach-vs-create and publish
   * under ONE lock acquisition, or a reader's existence check landing in a
   * writer's meta-replace window re-creates the table and publishes a
   * fresh-seed snapshot over the writers' state (observed as a shared-path
   * poller's counts jumping backwards to creation-time values). */
  def createTopK(name: String, baseName: String,
      options: Map[String, String], lockHeld: Boolean): graft.topk.TopKState = {
    val opts = graft.topk.TopKOptions.fromOptions(options,
      GraftSession.sessionZone(spark))
    val base = spark.table(baseName)
    val keyField = base.schema.find(_.name.equalsIgnoreCase(opts.key)).getOrElse(
      throw new IllegalArgumentException(
        s"TopK key column '${opts.key}' not found in $baseName"))
    // sketches store String or Long keys
    val keyType = keyField.dataType match {
      case org.apache.spark.sql.types.StringType => org.apache.spark.sql.types.StringType
      case _ => org.apache.spark.sql.types.LongType
    }
    val st = new graft.topk.TopKState(name, opts, keyType)
    // path-backed tables spill over-guard buckets next to their snapshot
    // (must be set before the first append can trigger a spill)
    options.collectFirst { case (k, v) if k.equalsIgnoreCase("path") => v }
      .foreach(p => st.setSpillBase(s"$p/${GraftSession.TopkSpillDir}"))
    st.append(base)
    state.topks.put(name.toLowerCase, st)
    state.topkBases.put(name.toLowerCase, baseName)
    refreshTopkView(st)
    // OPTIONS(path ...): persist the sketch snapshot so a fresh session can
    // re-attach without replaying the base (same restart semantics as
    // path-backed samples; the reference's TopKs live in its store)
    options.collectFirst { case (k, v) if k.equalsIgnoreCase("path") => v }
      .foreach { p =>
        state.topkPaths.put(name.toLowerCase, p)
        if (lockHeld) saveTopK(name, p)
        else GraftSession.withPathLock(spark, p)(saveTopK(name, p))
      }
    st
  }

  /** Append a micro-batch / DataFrame into an existing TopK structure
   * (the relation-backed view reads live state — no refresh needed).
   *
   * Path-backed tables serialize through the path lock with RELOAD → MERGE
   * → PUBLISH semantics: the distributed sketch build runs lock-free, then
   * under the lock the session re-attaches the latest published snapshot
   * (picking up any other session's appends), folds its partials in, and
   * publishes a new snapshot version. Two sessions appending concurrently
   * both land — the counts are a merge of both batches, not
   * last-writer-wins. Between appends a session's QUERIES read its own
   * (possibly stale) view; appending is what synchronizes. */
  def appendToTopK(name: String, df: DataFrame): Unit =
    appendToTopK(name, df, System.currentTimeMillis())

  /** [[appendToTopK]] with an explicit batch time — what a batch-timed
   * table buckets this append under (reference `DataFrameWithTime`);
   * ignored for time-series-column and untimed tables. */
  def appendToTopK(name: String, df: DataFrame, batchTimeMs: Long): Unit = {
    state.topkPaths.get(name.toLowerCase) match {
      case Some(p) =>
        val partials = topkState(name).buildPartials(df)
        GraftSession.withPathLock(spark, p) {
          val st = attachTopKTable(name, p)
          // rebase AFTER the reload so a batch-timed shift uses the
          // persisted epoch, not a stale pre-attach value
          st.mergePartialsAt(spark, partials, batchTimeMs)
          saveTopK(name, p)
        }
      case None => topkState(name).append(df, batchTimeMs)
    }
  }

  /** Streaming-populator variant of [[appendToTopK]]: EXACTLY-ONCE across
   * JVM crash/resume for path-backed tables. foreachBatch replays the
   * in-flight batch when a JVM dies between dependent population and the
   * source checkpoint's offset commit; this append checks the structure's
   * per-stream applied-batch watermark (persisted atomically with the
   * counts — [[saveTopK]]) under the path lock and skips already-applied
   * batch ids. In-memory tables keep the watermark in-process (their state
   * does not survive a crash, so replay cannot double-count by
   * construction; the check still fences STOP→START replays in one JVM). */
  def appendToTopKForBatch(name: String, df: DataFrame, batchTimeMs: Long,
      streamName: String, batchId: Long): Unit =
    appendToTopKForBatch(name, df, batchTimeMs, streamName, batchId, Nil)

  /** [[appendToTopKForBatch]] with `legacyStreamNames`: prior fence-key
   * spellings for the SAME logical stream (e.g. the pre-r12 checkpointed
   * sink key). Legacy watermarks are RETIRED on first consult
   * ([[graft.topk.TopKState.fenceAndRetire]]): a resumed pre-upgrade
   * query (batchId at or past the legacy watermark) migrates it into the
   * current key and stays fenced; a brand-new query (batch ids restarted
   * at 0) is NOT fenced by another query's stale watermark — pre-retire
   * code fenced every future sink's batches 0..N on an upgraded store
   * forever. Only the current key's watermark ever advances. */
  def appendToTopKForBatch(name: String, df: DataFrame, batchTimeMs: Long,
      streamName: String, batchId: Long,
      legacyStreamNames: Seq[String]): Unit = {
    state.topkPaths.get(name.toLowerCase) match {
      case Some(p) =>
        val partials = topkState(name).buildPartials(df)
        GraftSession.withPathLock(spark, p) {
          val st = attachTopKTable(name, p)
          val (fence, retired) =
            st.fenceAndRetire(streamName, legacyStreamNames, batchId)
          if (batchId > fence) {
            st.mergePartialsAt(spark, partials, batchTimeMs)
            st.setAppliedStreamBatch(streamName, batchId)
            saveTopK(name, p)
          } else if (retired) {
            // fenced replay that retired legacy state: persist the
            // retirement (and any migration) so a crash before the next
            // applied batch cannot resurrect the stale legacy watermark
            saveTopK(name, p)
          }
        }
      case None =>
        val st = topkState(name)
        val (fence, _) =
          st.fenceAndRetire(streamName, legacyStreamNames, batchId)
        if (batchId > fence) {
          st.append(df, batchTimeMs)
          st.setAppliedStreamBatch(streamName, batchId)
        }
    }
  }

  /** Streaming-populator variant of [[appendToSample]]: EXACTLY-ONCE across
   * JVM crash/resume for path-backed samples. The replay fence is the
   * `__streambatch.<stream>` watermark in the sample's registry metadata;
   * the batch's data files are published under a DETERMINISTIC per-batch
   * name prefix so a replay of a half-published batch (crash between the
   * file renames and the meta publish) deletes its own leftovers and
   * republishes instead of appending a second copy — the sequence
   * (delete-by-prefix → stage → rename into place → meta watermark, all
   * under the path lock) converges to exactly one copy of the batch no
   * matter where a previous attempt died.
   *
   * READER VISIBILITY during a crashed batch's recovery republication:
   * plain `spark.read.parquet(path)` readers don't take the path lock, so
   * a read overlapping the delete→rename window may transiently MISS the
   * recovering batch's rows, or fail outright when a listed file vanishes
   * mid-read. It can never observe duplicates or a torn batch (files are
   * only ever renamed complete, and the delete precedes the republish).
   * This window exists only while recovering a crash; steady-state appends
   * only ever ADD files. Readers needing read-your-writes through recovery
   * use [[readSample]], which pins a lock-consistent file snapshot —
   * both contracts pinned by CrossJvmConcurrencySpec's
   * reader-during-recovery case. */
  def appendToSampleForBatch(rawName: String, df: DataFrame,
      streamName: String, batchId: Long, seed: Long = 43L): DataFrame =
    appendToSampleForBatch(rawName, df, streamName, batchId, seed, Nil)

  /** [[appendToSampleForBatch]] with `legacyStreamNames` — prior fence-key
   * spellings of the same logical stream, retired on consult (same
   * rule as [[graft.topk.TopKState.fenceAndRetire]]): a resumed
   * pre-upgrade query — recognizable because its batch ids continue past
   * the legacy watermark — migrates the watermark into the current key
   * (and records a `__streammigrated.*` marker attributing the legacy
   * FILE spellings to this stream); a brand-new query (batch ids
   * restarted at 0) is not fenced by the stale watermark, which pre-retire
   * code did forever — but the watermark is QUARANTINED under
   * `__streamretired.<legacy>` rather than deleted, so a pre-upgrade
   * query that resumes AFTER the new query's consult still finds its
   * fence (deleting it outright would re-apply the resumed query's
   * replayed batches 0..N — duplicate rows, the dual of the data-loss
   * bug). A quarantined key whose pre-upgrade query never resumes stays
   * FOREVER by design — one small meta property per retired stream, and
   * sweeping it on any schedule reopens that duplicate window for a
   * query resuming after the sweep. Boundary (`batchId == legacy`, incl. legacy == 0 vs a new
   * query's batch 0): treated as the resumed query and fenced — see
   * [[graft.topk.TopKState.fenceAndRetire]] for why the replay-safe side
   * of the inherent ambiguity is the right trade. Legacy-spelling
   * leftover FILES for this batch are cleaned only when the marker
   * attributes them to this stream — a new query's batch ids overlap a
   * previous stream's published batches, and deleting by the shared
   * legacy spelling would destroy published data. */
  def appendToSampleForBatch(rawName: String, df: DataFrame,
      streamName: String, batchId: Long, seed: Long,
      legacyStreamNames: Seq[String]): DataFrame = {
    val name = state.resolveSample(rawName).getOrElse(
      throw new IllegalArgumentException(s"No sample table named $rawName"))
    val info = state.samples(name)
    info.persistPath match {
      case Some(path) =>
        val conf = spark.sessionState.newHadoopConf()
        val wmKey = s"__streambatch.${streamName.toLowerCase}"
        val migratedKey = s"__streammigrated.${streamName.toLowerCase}"
        val legacyWmKeys = legacyStreamNames.map(n =>
          s"__streambatch.${n.toLowerCase}")
        val retiredWmKeys = legacyStreamNames.map(n =>
          s"__streamretired.${n.toLowerCase}")
        GraftSession.withPathLock(spark, path) {
          // fence BEFORE the retirement meta rewrites below, not just the
          // batch publish — a zombie's stale-props meta replace could
          // clobber the successor's watermark (lost update → replayed
          // batches re-apply as duplicates)
          GraftSession.assertStoreFence(spark, path)
          val cur = GraftSession.readSampleMetaProp(path, wmKey, conf)
            .map(_.toLong)
          val liveVals = legacyWmKeys.flatMap(k =>
            GraftSession.readSampleMetaProp(path, k, conf).map(_.toLong))
          val retiredVals = retiredWmKeys.flatMap(k =>
            GraftSession.readSampleMetaProp(path, k, conf).map(_.toLong))
          val allLegacy = liveVals ++ retiredVals
          val migrating = cur.isEmpty && allLegacy.nonEmpty &&
            batchId >= allLegacy.max
          val applied = cur match {
            // quarantined values do NOT join the defensive max: a new
            // query's own watermark legitimately sits below them
            case Some(c) => liveVals.foldLeft(c)(math.max)
            case None if migrating => allLegacy.max
            case None => -1L // brand-new stream: stale legacy must not fence
          }
          if (allLegacy.nonEmpty) {
            // retire NOW, in one atomic meta republish — even when the
            // batch below is fenced, so a crash cannot resurrect the
            // stale watermark for the next brand-new sink. Three shapes:
            // migrating — watermark (live or quarantined) moves under the
            // current key; current-key consult — live spellings are
            // superseded, quarantine stays for the late-resuming
            // pre-upgrade query; brand-new consult — live spellings move
            // into quarantine (per-key max with any prior quarantine)
            if (migrating) {
              GraftSession.rewriteSampleMetaProps(path,
                legacyWmKeys ++ retiredWmKeys,
                Map(wmKey -> allLegacy.max.toString, migratedKey -> "true"),
                conf)
            } else if (cur.isDefined) {
              GraftSession.rewriteSampleMetaProps(path, legacyWmKeys,
                Map.empty, conf)
            } else if (liveVals.nonEmpty) {
              val quarantined = legacyStreamNames.flatMap { n =>
                val live = GraftSession.readSampleMetaProp(path,
                  s"__streambatch.${n.toLowerCase}", conf).map(_.toLong)
                val prior = GraftSession.readSampleMetaProp(path,
                  s"__streamretired.${n.toLowerCase}", conf).map(_.toLong)
                live.map(v => s"__streamretired.${n.toLowerCase}" ->
                  math.max(v, prior.getOrElse(-1L)).toString)
              }.toMap
              GraftSession.rewriteSampleMetaProps(path, legacyWmKeys,
                quarantined, conf)
            }
          }
          // legacy FILE spellings belong to this stream iff it migrated
          // (now, or on an earlier consult that crashed before publishing)
          val ownsLegacyFiles = migrating || GraftSession
            .readSampleMetaProp(path, migratedKey, conf).isDefined
          if (batchId > applied) {
            // store-level fence: validated before every mutation below,
            // and stamped into the published file names so readSample can
            // quarantine anything a zombie lands past the checks
            GraftSession.assertStoreFence(spark, path)
            val fenceTag = GraftSession.heldFence(spark, path)
              .map(f => s".e${f.epoch}").getOrElse("")
            val sampled = StratifiedSampler.sample(df, info.qcs.map(expr),
              info.fraction, info.reservoirSize, seed, preFilter = true,
              preFilterFactor = 2.0, rankCols = Nil)
            val dir = new org.apache.hadoop.fs.Path(path)
            val fs = dir.getFileSystem(conf)
            // the sanitized name alone is NOT collision-free ('a.b' and
            // 'a_b' both sanitize to a_b, and the leftover-deletion pass
            // for one stream's replayed batch would delete the other's
            // published files for the same batch id) — a hash of the RAW
            // key ([[GraftSession.keyHashSuffix]]) disambiguates while the
            // sanitized name keeps the files human-attributable
            val raw = streamName.toLowerCase
            val safe = raw.replaceAll("[^a-z0-9]", "_") + "-" +
              GraftSession.keyHashSuffix(raw)
            val prefix = s"stream-$safe-b$batchId-"
            val staging = new org.apache.hadoop.fs.Path(dir,
              s".staging-$safe-b$batchId")
            // pre-hash file name formats, so a store carrying leftovers of
            // a publish that crashed BEFORE an upgrade still converges:
            // this stream's own pre-hash spelling always (the raw key
            // embeds the checkpoint hash, so it is stream-unique), plus
            // the SHARED legacy fence-key spellings only when the
            // migration marker attributes them to this stream — a
            // brand-new query's batch ids overlap a previous stream's
            // published batches under the shared spelling, and deleting
            // by it would destroy that stream's published data
            val legacyRaws = raw +:
              (if (ownsLegacyFiles) legacyStreamNames.map(_.toLowerCase)
               else Nil)
            val legacyPrefixes = legacyRaws.map { r =>
              val s = r.replaceAll("[^a-z0-9]", "_")
              (s"stream-$s-b$batchId-", s".staging-$s-b$batchId")
            }
            // leftovers of a crashed prior attempt at THIS batch —
            // including readSample-quarantined `.fenced-` spellings of it
            if (fs.exists(dir)) fs.listStatus(dir).foreach { s0 =>
              val n = s0.getPath.getName
              val bare = if (n.startsWith(".fenced-")) n.drop(8) else n
              if (bare.startsWith(prefix) || n == staging.getName ||
                  legacyPrefixes.exists { case (pf, st0) =>
                    bare.startsWith(pf) || n == st0 }) {
                fs.delete(s0.getPath, true)
              }
            }
            // stage (dot-prefixed: hidden from parquet readers), then move
            // each complete part file into place under the batch prefix;
            // re-validate the fence after the distributed staging write —
            // the longest stretch a frozen process could sleep through
            sampled.write.mode("overwrite").parquet(staging.toString)
            GraftSession.assertStoreFence(spark, path)
            var k = 0
            fs.listStatus(staging).foreach { s0 =>
              if (s0.getPath.getName.endsWith(".parquet")) {
                val dst = new org.apache.hadoop.fs.Path(dir,
                  s"$prefix$k$fenceTag.parquet")
                require(fs.rename(s0.getPath, dst),
                  s"could not publish sample batch file $dst")
                k += 1
              }
            }
            fs.delete(staging, true)
            GraftSession.assertStoreFence(spark, path)
            GraftSession.updateSampleMetaProp(path, wmKey,
              batchId.toString, conf)
          }
        }
        spark.catalog.refreshByPath(path)
        val merged = spark.read.parquet(path)
        merged.createOrReplaceTempView(name)
        state.samples.put(name, info.copy(sampleDf = merged))
        merged
      case None =>
        // in-memory sample: a crash loses the sample with the watermark
        // (nothing to protect), but a same-JVM STOP→START replays the last
        // uncommitted batch — fence it with the session-level watermark
        val key = (name.toLowerCase, streamName.toLowerCase)
        if (batchId > state.streamSampleBatches.getOrElse(key, -1L)) {
          val out = appendToSample(rawName, df, seed)
          state.streamSampleBatches.put(key, batchId)
          out
        } else info.sampleDf
    }
  }

  /** Persist a TopK structure's options + full sketch snapshot under
   * `path` (Hadoop FS — works for hdfs:// and s3a:// paths like the
   * sample persist path).
   *
   * Publishes are TORN-PROOF: the bucket state + spill view go into one
   * immutable versioned snapshot file (`_topk.snap.<n>`, written to a temp
   * name and renamed — a reader can never observe a partial snapshot), and
   * the small meta file (options + `__snapversion` pointer) is replaced
   * last. A reader that catches the brief delete→rename gap on the meta, or
   * a pointer to an already-GC'd snapshot version, retries
   * ([[attachTopKTable]]); it can be delayed, never corrupted. Callers
   * mutating a SHARED path hold [[GraftSession.withPathLock]]. */
  def saveTopK(name: String, path: String): Unit = {
    val st = topkState(name)
    val conf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    // store-level fence (validated again at both commit points below);
    // the held epoch rides in the snapshot FILE NAME, so a zombie's
    // same-version publish can never clobber the successor's snapshot —
    // distinct epochs are distinct files, and the meta pointer names
    // exactly one of them
    GraftSession.assertStoreFence(spark, path)
    val fence = GraftSession.heldFence(spark, path)
    val fenceSuffix = fence.map(f => s".f${f.epoch}").getOrElse("")
    val version = GraftSession.readTopkSnapVersion(path, conf).getOrElse(0L) + 1
    // --- snapshot body: spill view + bucket bytes, one immutable file ---
    val snapPath = new org.apache.hadoop.fs.Path(dir,
      s"${GraftSession.TopkSnapPrefix}$version$fenceSuffix")
    val tmpPath = new org.apache.hadoop.fs.Path(dir,
      s"${GraftSession.TopkSnapPrefix}$version.tmp-" +
        java.util.UUID.randomUUID().toString.take(8))
    // capture spill view + bucket bytes under ONE lock hold: a streaming
    // sink appending between the two reads would snapshot a spill index
    // inconsistent with the bucket state
    val ((files, spans), bin) = st.stateLock.synchronized {
      (st.spillView, st.buckets.snapshotBytes)
    }
    val out = new java.io.DataOutputStream(fs.create(tmpPath, true))
    try {
      // qualify BOTH sides before stripping: listStatus-derived batch paths
      // come back scheme-qualified (file:/..., hdfs://nn/...) while the
      // table path is usually raw — a plain startsWith would store the
      // qualified form verbatim and a later restore would mangle it into
      // <table>/file:/... (single-slash URIs defeat the "://" test)
      val prefix = fs.makeQualified(dir).toString.stripSuffix("/") + "/"
      out.writeInt(files.size)
      // batch dirs live under the table path — store them relative so the
      // whole directory can be relocated/copied
      files.foreach { f =>
        val qf = fs.makeQualified(new org.apache.hadoop.fs.Path(f)).toString
        out.writeUTF(if (qf.startsWith(prefix)) qf.stripPrefix(prefix) else f)
      }
      out.writeInt(spans.size)
      spans.foreach { case (s, l) => out.writeLong(s); out.writeLong(l) }
      out.writeInt(bin.length)
      out.write(bin)
    } finally out.close()
    GraftSession.assertStoreFence(spark, path)
    if (fs.exists(snapPath)) fs.delete(snapPath, false) // crashed same-version writer
    require(fs.rename(tmpPath, snapPath),
      s"could not publish TopK snapshot $snapPath")
    // --- meta: options + snapshot pointer, replaced last ---
    val props = new java.util.Properties()
    val o = st.opts
    props.setProperty("key", o.key)
    o.timeSeriesColumn.foreach(props.setProperty("timeseriescolumn", _))
    // `timeinterval` only for TIMED tables: its mere presence without a
    // time-series column marks a table batch-timed at option resolution
    // (TopKOptions.fromOptions), so writing it for untimed tables would
    // flip their semantics on re-attach
    if (o.timeSeriesColumn.isDefined || o.batchTimed) {
      props.setProperty("timeinterval", o.timeIntervalMs.toString)
    }
    if (o.batchTimed) {
      props.setProperty("batchtimed", "true")
      // the established origin keeps interval numbering stable across
      // re-attaches (first-append time unless an epoch was declared)
      if (st.establishedEpoch >= 0L) {
        props.setProperty("epoch", st.establishedEpoch.toString)
      }
    }
    props.setProperty("size", o.size.toString)
    props.setProperty("depth", o.depth.toString)
    props.setProperty("width", o.width.toString)
    props.setProperty("maxinterval", o.maxInterval.toString)
    props.setProperty("streamsummary", o.streamSummary.toString)
    o.frequencyCol.foreach(props.setProperty("frequencycol", _))
    props.setProperty("capacity", o.capacity.toString)
    props.setProperty("seed", o.seed.toString)
    props.setProperty("timeunit", o.timeUnit)
    props.setProperty("itemaggregation", o.itemAggregation.toString)
    props.setProperty("timeanditemaggregation", o.timeAndItemAggregation.toString)
    props.setProperty("maxdriverentries", o.maxDriverEntries.toString)
    props.setProperty("__keytype",
      if (st.keyType == org.apache.spark.sql.types.StringType) "string" else "long")
    props.setProperty("__base",
      state.topkBases.getOrElse(name.toLowerCase, ""))
    props.setProperty("__snapversion", version.toString)
    fence.foreach(f => props.setProperty("__snapfence", f.epoch.toString))
    // stamp this publish's retirees and PERSIST the survivors: the next
    // append re-attaches a fresh state, so an in-memory-only list would be
    // forgotten and compacted-away batch dirs would leak forever. Deletion
    // of the released entries happens after the meta replace below.
    val releasedBatches = st.collectRetired(version)
    val survivors = st.retiredView
    if (survivors.nonEmpty) {
      props.setProperty("__retired",
        survivors.map { case (v, p) => s"$v|$p" }.mkString("\n"))
    }
    // per-stream applied-batch watermarks ride the same atomic meta publish
    // as the counts they fence (streaming exactly-once — TopKState docs)
    val streamBatches = st.streamBatchView
    if (streamBatches.nonEmpty) {
      props.setProperty("__streambatch",
        streamBatches.map { case (s, b) => s"$s|$b" }.mkString("\n"))
    }
    val metaPath = new org.apache.hadoop.fs.Path(dir, GraftSession.TopkMetaFile)
    val metaTmp = new org.apache.hadoop.fs.Path(dir,
      GraftSession.TopkMetaFile + ".tmp-" +
        java.util.UUID.randomUUID().toString.take(8))
    val metaOut = fs.create(metaTmp, true)
    try props.store(metaOut, "graft topk registry") finally metaOut.close()
    GraftSession.assertStoreFence(spark, path)
    // ATOMIC replace: FileContext.rename(OVERWRITE) swaps the meta in one
    // operation on local and HDFS filesystems. The previous delete→rename
    // pair exposed a no-meta window — a concurrent reader (or a reloading
    // appender in another process) catching it would see "no registry
    // metadata" and could treat the store as empty, publishing without the
    // other session's data (lost update)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fs.makeQualified(metaPath).toUri, conf)
    fc.rename(fs.makeQualified(metaTmp), fs.makeQualified(metaPath),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    // retire snapshots two or more versions old (current-1 is kept so a
    // reader holding the previous pointer can still finish its attach)
    fs.listStatus(dir).foreach { s =>
      val n = s.getPath.getName
      if (n.startsWith(GraftSession.TopkSnapPrefix) && !n.contains(".tmp-")) {
        // `<v>` or fence-stamped `<v>.f<epoch>`
        val core = n.stripPrefix(GraftSession.TopkSnapPrefix)
        val v = core.takeWhile(_.isDigit)
        val rest = core.drop(v.length)
        if (v.nonEmpty && (rest.isEmpty || rest.matches("\\.f[0-9]+")) &&
            v.toLong < version - 1) {
          fs.delete(s.getPath, false)
        }
      }
    }
    // the legacy two-file layout is superseded by the snapshot
    val legacyBin = new org.apache.hadoop.fs.Path(dir, GraftSession.TopkBinFile)
    if (fs.exists(legacyBin)) fs.delete(legacyBin, false)
    // compacted-away batches become deletable one publish AFTER the
    // snapshot that stopped referencing them — mirroring the snapshot GC's
    // keep-one-back policy, so a reader attaching the retained version-1
    // still finds every file it references (collected above, before the
    // meta write, so the survivors persisted with this publish)
    releasedBatches.foreach { f =>
      val hp = new org.apache.hadoop.fs.Path(f)
      if (fs.exists(hp)) fs.delete(hp, true)
    }
  }

  /** Re-attach a persisted TopK structure in a fresh session without
   * replaying the base table (counterpart of [[attachSampleTable]]).
   * Retries through a concurrent writer's publish window (meta replace /
   * snapshot GC) — see [[saveTopK]]. */
  def attachTopKTable(name: String, path: String): graft.topk.TopKState = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    var attempt = 0
    var result: Option[graft.topk.TopKState] = None
    while (result.isEmpty) {
      attempt += 1
      try result = Some(attachTopKOnce(fs, dir, name, path))
      catch {
        case e @ (_: java.io.FileNotFoundException |
                  _: IllegalArgumentException) if attempt < 8 &&
            GraftSession.isTransientAttach(e) =>
          Thread.sleep(100)
      }
    }
    result.get
  }

  private def attachTopKOnce(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, name: String,
      path: String): graft.topk.TopKState = {
    val metaPath = new org.apache.hadoop.fs.Path(dir, GraftSession.TopkMetaFile)
    if (!fs.exists(metaPath)) {
      throw new IllegalArgumentException(
        s"No TopK registry metadata (${GraftSession.TopkMetaFile}) under $path")
    }
    val props = GraftSession.loadPropsTornFree(metaPath,
      spark.sessionState.newHadoopConf())
    import scala.jdk.CollectionConverters._
    val optsMap = props.stringPropertyNames().asScala
      .filterNot(_.startsWith("__"))
      .map(k => k -> props.getProperty(k)).toMap
    val opts = graft.topk.TopKOptions.fromOptions(optsMap,
      GraftSession.sessionZone(spark))
    val keyType =
      if (props.getProperty("__keytype") == "string")
        org.apache.spark.sql.types.StringType
      else org.apache.spark.sql.types.LongType
    val st = new graft.topk.TopKState(name, opts, keyType)
    val spillDir = new org.apache.hadoop.fs.Path(dir, GraftSession.TopkSpillDir)
    Option(props.getProperty("__snapversion")).map(_.toLong) match {
      case Some(v) =>
        // fence-stamped publishes name their snapshot `<v>.f<epoch>`; the
        // meta pointer carries the epoch so readers open EXACTLY the file
        // the publishing holder renamed — a zombie's same-version file is
        // a different name and simply never read
        val fenceSuffix = Option(props.getProperty("__snapfence"))
          .map(e => s".f$e").getOrElse("")
        val snapPath = new org.apache.hadoop.fs.Path(dir,
          s"${GraftSession.TopkSnapPrefix}$v$fenceSuffix")
        // may throw FileNotFoundException when a concurrent writer advanced
        // past v and GC'd it — the caller retries with the fresh meta
        val snapIn = new java.io.DataInputStream(fs.open(snapPath))
        val (files, spans, bin) =
          try {
            val prefix = path.stripSuffix("/") + "/"
            val fl = (0 until snapIn.readInt()).map { _ =>
              val rel = snapIn.readUTF()
              // absolute = rooted path OR any URI scheme — Hadoop qualified
              // paths can be single-slash (file:/tmp/...), so a bare "://"
              // test misclassifies them as relative
              if (rel.startsWith("/") ||
                  rel.matches("^[a-zA-Z][a-zA-Z0-9+.-]*:/.*")) rel
              else prefix + rel
            }
            val sp = (0 until snapIn.readInt()).map { _ =>
              (snapIn.readLong(), snapIn.readLong())
            }
            val b = new Array[Byte](snapIn.readInt())
            snapIn.readFully(b)
            (fl, sp, b)
          } finally snapIn.close()
        st.stateLock.synchronized { st.buckets.restoreFrom(bin) }
        st.restoreSpillView(spark, spillDir.toString, files, spans)
        Option(props.getProperty("__retired")).foreach { enc =>
          st.restoreRetired(enc.split('\n').toSeq.filter(_.nonEmpty).map { line =>
            val sep = line.indexOf('|')
            (line.take(sep).toLong, line.drop(sep + 1))
          })
        }
      case None =>
        // legacy two-file layout: _topk.bin + directory-listed spill store
        val binPath = new org.apache.hadoop.fs.Path(dir, GraftSession.TopkBinFile)
        val binIn = fs.open(binPath)
        val bytes =
          try {
            val len = fs.getFileStatus(binPath).getLen.toInt
            val b = new Array[Byte](len); binIn.readFully(b); b
          } finally binIn.close()
        st.stateLock.synchronized { st.buckets.restoreFrom(bytes) }
        if (fs.exists(spillDir)) st.attachSpill(spark, spillDir.toString)
        else st.setSpillBase(spillDir.toString)
    }
    Option(props.getProperty("__streambatch")).foreach { enc =>
      st.restoreStreamBatches(enc.split('\n').toSeq.filter(_.nonEmpty).map {
        line =>
          val sep = line.lastIndexOf('|')
          (line.take(sep), line.drop(sep + 1).toLong)
      })
    }
    st.setSpillBase(spillDir.toString)
    state.topks.put(name.toLowerCase, st)
    props.getProperty("__base", "") match {
      case "" =>
      case b => state.topkBases.put(name.toLowerCase, b)
    }
    state.topkPaths.put(name.toLowerCase, path)
    refreshTopkView(st)
    st
  }

  /** TopK structures are queryable as tables (`SELECT * FROM topkName` —
   * reference `TopKRelation.buildScan`, `sql/topk/TopKRelation.scala:59-86`)
   * through a `PrunedFilteredScan` relation: `start_time`/`end_time` are
   * TIMESTAMP columns, so windows are `WHERE start_time >= '2024-01-02
   * 00:00:00'` (string coerces in the session zone) or `>= timestamp_millis
   * (<epoch ms>)` — both prune sketch intervals before the merge, and the
   * view always reflects the live sketch state. Bare epoch-number
   * comparisons do NOT coerce under the ANSI analyzer. */
  private def refreshTopkView(st: graft.topk.TopKState): Unit =
    org.apache.spark.sql.graft.Plans
      .relationDf(spark, new graft.topk.TopKRelation(st, spark))
      .createOrReplaceTempView(st.name)

  /** Query top-k keys between epoch-millisecond times (reference
   * `queryTopK(name, start, end, k)`; `-1` on either side is an OPEN bound,
   * as in the reference's `queryApproxTSTopK(name, -1, -1)` full-history
   * form — `AQPStreamingSuite.scala:819`). */
  def queryTopK(name: String, startMs: Long = Long.MinValue,
      endMs: Long = Long.MaxValue, k: Int = -1): DataFrame = {
    val st = topkState(name)
    val s = if (startMs == -1L) Long.MinValue else startMs
    val e = if (endMs == -1L) Long.MaxValue else endMs
    st.queryTopK(spark, s, e, if (k > 0) k else st.opts.size)
  }

  /** Timestamp-string window (reference
   * `SnappyContextAQPFunctions.queryTopK:143-153` — `null`/empty bound =
   * open; accepts `yyyy-MM-dd HH:mm:ss[.fff]`, `yyyy-MM-dd`, or epoch ms). */
  def queryTopK(name: String, startTime: String, endTime: String,
      k: Int): DataFrame =
    queryTopK(name,
      GraftSession.parseTimestampMs(startTime, Long.MinValue,
        GraftSession.sessionZone(spark)),
      GraftSession.parseTimestampMs(endTime, Long.MaxValue,
        GraftSession.sessionZone(spark)), k)

  def queryTopK(name: String, startTime: String, endTime: String): DataFrame =
    queryTopK(name, startTime, endTime, -1)

  /** Reference-named alias for [[queryTopK]]
   * (`snappy.queryApproxTSTopK(name, start, end, k)`). */
  def queryApproxTSTopK(name: String, startMs: Long = Long.MinValue,
      endMs: Long = Long.MaxValue, k: Int = -1): DataFrame =
    queryTopK(name, startMs, endMs, k)

  /** Timestamp-string alias (reference `AQPStreamingSuite` calls
   * `queryApproxTSTopK(name, startTimeString, endTimeString)`). */
  def queryApproxTSTopK(name: String, startTime: String,
      endTime: String): DataFrame =
    queryTopK(name, startTime, endTime, -1)

  def queryApproxTSTopK(name: String, startTime: String, endTime: String,
      k: Int): DataFrame =
    queryTopK(name, startTime, endTime, k)

  private[graft] def topkState(name: String): graft.topk.TopKState =
    state.topks.get(name.toLowerCase) match {
      case Some(st: graft.topk.TopKState) => st
      case _ => throw new IllegalArgumentException(s"No TopK structure named $name")
    }

  /** Frequency estimate (lower, estimate, upper) of one key between epoch
   * times — the `queryAtTime`/`queryBetweenTime` surface of the reference's
   * Hokusai structures (`execution/Hokusai.scala:68-660`). */
  def queryFrequency(name: String, key: Any, startMs: Long = Long.MinValue,
      endMs: Long = Long.MaxValue): Option[(Long, Long, Long)] =
    topkState(name).queryFrequency(key, startMs, endMs)

  /** Timestamp-string window over [[queryFrequency]] (`null`/empty = open). */
  def queryFrequency(name: String, key: Any, startTime: String,
      endTime: String): Option[(Long, Long, Long)] =
    queryFrequency(name, key,
      GraftSession.parseTimestampMs(startTime, Long.MinValue,
        GraftSession.sessionZone(spark)),
      GraftSession.parseTimestampMs(endTime, Long.MaxValue,
        GraftSession.sessionZone(spark)))

  /**
   * DataFrame-API approximate execution (reference entry point B —
   * `withErrorDataFrame`, `SnappyContextAQPFunctions.scala:358-368`): rewrite
   * the given aggregation DataFrame to run against the best matching sample
   * with the requested error contract. Use `graft.aqp.functions.*` for error
   * columns inside `df`.
   */
  def withError(df: DataFrame, error: Double = Double.NaN,
      confidence: Double = Double.NaN, behavior: String = null): DataFrame = {
    import org.apache.spark.sql.graft.{AqpRewrite, ErrorConfidence, Plans}
    val node = ErrorConfidence(
      Option(error).filterNot(_.isNaN),
      Option(confidence).filterNot(_.isNaN),
      Option(behavior),
      Plans.analyzed(df))
    Plans.ofRows(spark, AqpRewrite(spark)(node))
  }
}

object GraftSession {
  private val log = org.slf4j.LoggerFactory.getLogger(classOf[GraftSession])

  def apply(spark: SparkSession): GraftSession = new GraftSession(spark)

  /** Split a comma-separated expression list at paren depth 0 only, so
   * function arguments (`substr(x, 1, 3)`) stay inside their expression.
   * Tracks single-quote state (with SQL `''` escaping) so a quoted comma —
   * `concat(region, ', ', nation)` or a top-level `','` literal — never
   * splits, and parens inside string literals don't skew the depth.
   * Unbalanced parens outside quotes are a malformed expression list and
   * fail here rather than mis-splitting silently.
   *
   * `escapedStringLiterals` mirrors `spark.sql.parser.escapedStringLiterals`:
   * under standard-SQL literals (true) a backslash is an ORDINARY character
   * — Spark parses `'...\'` as backslash + closing quote, and treating the
   * backslash as a `\'` escape here would mis-track quote state and reject
   * a valid list as unterminated. Pass the session's conf where a session
   * is in reach. */
  private[graft] def splitTopLevel(s: String,
      escapedStringLiterals: Boolean = false): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inQuote = false
    var escaped = false
    s.foreach {
      case c if escaped => escaped = false; cur += c
      case ',' if depth == 0 && !inQuote => out += cur.toString; cur.clear()
      case c =>
        if (inQuote && c == '\\' && !escapedStringLiterals) {
          escaped = true // \' escape inside a literal (default parser mode)
        } else if (c == '\'') inQuote = !inQuote // '' escape = two toggles, net even
        else if (!inQuote) {
          if (c == '(') depth += 1
          else if (c == ')') {
            depth -= 1
            require(depth >= 0, s"unbalanced ')' in expression list: $s")
          }
        }
        cur += c
    }
    require(depth == 0 && !inQuote && !escaped,
      s"unbalanced parentheses or unterminated quote in expression list: $s")
    out += cur.toString
    out.iterator.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Option-driven sampling of an arbitrary DataFrame — the shared engine
   * behind `CREATE SAMPLE TABLE ... OPTIONS(...)` and the DataFrame-side
   * `df.stratifiedSample(Map(...))` syntax. Returns
   * (sampled, qcs, fraction, reservoirSize). Supports the full reference
   * option set: `qcs`, `fraction`, `strataReservoirSize`, `seed`,
   * `timeSeriesColumn`/`timeInterval`/`timeUnit` (time-slot strata —
   * `StratifiedSamplerCached.scala:96-120`) and
   * `errorLimitColumn`/`errorLimitPercent`/`confidence`
   * (`StratifiedSamplerErrorLimit`). Keys are case-insensitive. */
  private[graft] def sampleByOptions(base: DataFrame,
      opts0: Map[String, String]): (DataFrame, Seq[String], Double, Int) = {
    val opts = opts0.map { case (k, v) => k.toLowerCase -> v }
    // top-level comma split: the QCS may hold function expressions with
    // their own argument commas — `qcs 'carrier, substr(route, 1, 3)'` is
    // two strata expressions, not four (reference AQP-282 uses
    // `qcs 'hack_license, year(pickup_datetime), month(pickup_datetime)'`)
    val qcsBase = opts.get("qcs").map(GraftSession.splitTopLevel(_,
      base.sparkSession.sessionState.conf.escapedStringLiterals)).getOrElse(Nil)
    // time-slot strata: bucket the time column into timeInterval-ms slots and
    // make the slot part of the stratum key
    val timeQcs = opts.get("timeseriescolumn").map { ts =>
      val ivMs = opts.get("timeinterval").map(_.toLong).getOrElse(5000L)
      val tsType = base.schema.find(_.name.equalsIgnoreCase(ts)).map(_.dataType)
      // timestamp-typed columns carry their own unit and win over the
      // declared timeUnit (graft.TimeCol, tz-independent); integral columns
      // keep the declared-unit dispatch, with integer `div` so ns epochs
      // above 2^53 don't lose slot precision to double division
      if (tsType.exists(TimeCol.isTimeTyped)) {
        TimeCol.slotSql(ts, tsType, "ms", ivMs)
      } else opts.getOrElse("timeunit", "auto") match {
        case "ns" => s"($ts div ${ivMs * 1000000L})"
        case "s" => s"floor($ts * 1000 / $ivMs)"
        case "ms" => s"floor($ts / $ivMs)"
        case _ => s"floor(cast($ts as double) * 1000 / $ivMs)"
      }
    }.toSeq
    val qcs = qcsBase ++ timeQcs
    val reservoirSize = opts.get("stratareservoirsize").map(_.toInt).getOrElse(50)
    val seed = opts.get("seed").map(_.toLong).getOrElse(42L)
    val fraction = opts.get("fraction").map(_.toDouble).getOrElse(0.0)

    val sampled = opts.get("errorlimitcolumn") match {
      case Some(errCol) =>
        StratifiedSampler.sampleWithErrorLimit(base, qcs.map(expr), expr(errCol),
          errorLimitPercent = opts.get("errorlimitpercent").map(_.toDouble).getOrElse(10.0),
          confidence = opts.get("confidence").map(_.toDouble).getOrElse(0.95),
          reservoirSize = reservoirSize, seed = seed)
      case None =>
        StratifiedSampler.sample(base, qcs.map(expr), fraction, reservoirSize,
          seed, preFilter = true, preFilterFactor = 2.0, rankCols = Nil)
    }
    (sampled, qcs, fraction, reservoirSize)
  }

  /** Registry metadata persisted next to a path-backed sample, so a FRESH
   * session can re-attach the sample without resampling (the reference's
   * samples survive restarts through its store catalog). Underscore-prefixed
   * so parquet readers ignore it. */
  val MetaFile = "_graft_sample.meta"
  val TopkMetaFile = "_graft_topk.meta"
  val TopkBinFile = "_graft_topk.bin"
  /** Versioned one-file snapshots (`_topk.snap.<n>` = spill view + bucket
   * bytes); `__snapversion` in the meta points at the current one. */
  val TopkSnapPrefix = "_graft_topk.snap."
  /** Subdirectory (under a path-backed TopK's path) holding spilled
   * interval buckets as parquet. */
  val TopkSpillDir = "_graft_topk_spill"

  /** Collision-free suffix for durable identities derived from free-form
   * keys (sink fence keys, per-batch sample file prefixes): MurmurHash3 is
   * deterministic across JVMs — crash-replay fencing and delete-by-prefix
   * both require the SAME key to reproduce after a restart — and the 'h'
   * marker keeps the hex from ever reading as a neighbouring name segment
   * (hex has no 'h', so e.g. a legacy "-b<batchId>-" segment can never
   * prefix-match a new-format name through an unlucky hash value). */
  private[graft] def keyHashSuffix(raw: String): String =
    "h" + java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(raw))

  /** Current published snapshot version of a path-backed TopK (None for a
   * fresh dir or a legacy two-file layout). */
  private[graft] def readTopkSnapVersion(path: String,
      conf: org.apache.hadoop.conf.Configuration): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(path, TopkMetaFile)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val props = loadPropsTornFree(p, conf)
    Option(props.getProperty("__snapversion")).map(_.toLong)
  }

  /** Attach-retry predicate: a missing snapshot file (GC'd under a reader
   * holding the previous pointer) or a momentarily-absent meta (the
   * delete→rename publish gap) heals on retry; anything else is real. */
  private[graft] def isTransientAttach(e: Throwable): Boolean = e match {
    case _: java.io.FileNotFoundException => true
    case ia: IllegalArgumentException =>
      Option(ia.getMessage).exists(_.startsWith("No TopK registry metadata"))
    case _ => false
  }

  /**
   * Serialize mutations of a shared persist path (sample/TopK appends,
   * snapshot publishes) across sessions and JVMs: an exclusive lock file
   * (`_graft.lock`) created atomically (`FileSystem.create` with
   * `overwrite = false` — atomic on HDFS; on a LOCAL filesystem Hadoop's
   * create(false) is check-then-act, so acquisition goes through
   * `File.createNewFile` there, which is an atomic `open(O_CREAT|O_EXCL)`
   * across processes on one host), with a HEARTBEAT LEASE: the holder
   * refreshes the lock file's mtime every `leaseMs / 4` from a daemon
   * thread, and a waiter may break the lock only when the heartbeat is
   * STALE — mtime older than `spark.graft.pathLock.leaseMs` (default
   * 120 s). Liveness, not wall time, gates breaking: a live holder may
   * run arbitrarily long past the lease (recovery republication scales
   * with store size; a fixed must-finish-inside-the-lease contract broke
   * a live slow holder in practice), while a crashed holder stops
   * heartbeating and is broken within one lease as before. Waiters give
   * up loudly after `spark.graft.pathLock.acquireTimeoutMs` (default
   * 2 × leaseMs) — the holder is then known live, just slow.
   *
   * Residual hazard of the lease alone: a WHOLE-PROCESS stall longer
   * than the lease — the daemon heartbeat thread itself frozen, e.g. a
   * VM pause — lets a waiter break a lock whose holder later resumes.
   * The holder detects the break on its next heartbeat (the lock file's
   * token no longer matches), flags the loss, skips deleting the
   * successor's lock on exit, and logs loudly — but its in-flight writes
   * could interleave with the new holder's for up to one heartbeat
   * period. STORE-LEVEL FENCING closes that window (classic
   * fencing-token design): every acquisition bumps a monotonic epoch in
   * `_graft.fence` (readable by all sessions), the held epoch is exposed
   * to the critical section via [[GraftSession.heldFence]], publishes
   * stamp their artifacts with it, every commit point re-validates it
   * ([[GraftSession.assertStoreFence]], throwing
   * [[FencedLockException]] for a broken holder), and [[readSample]]
   * quarantines same-batch files from a superseded epoch — so a zombie
   * publish that slips past the ms-scale validation window is IGNORED by
   * readers rather than served. Long-running distributed writes
   * (streaming batch publishes, ad-hoc appends via
   * [[GraftSession.publishAppend]]) stage dot-prefixed and re-validate
   * AFTER the job, so a whole-job freeze cannot land files either. The
   * epoch bump itself is verified after its write (lock still ours,
   * fence carries our token) before the critical section is entered — a
   * holder frozen between the lock create and the bump stands down on
   * resume instead of publishing under a duplicate epoch, and the one
   * thing such a pre-verify zombie CAN do (clobber the fence file with
   * the live holder's own epoch under a foreign token) is detected and
   * repaired by the live holder's next commit-point check.
   */
  def withPathLock[A](spark: SparkSession, path: String)(body: => A): A = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(path)
    val lockPath = new org.apache.hadoop.fs.Path(dir, "_graft.lock")
    val fs = lockPath.getFileSystem(conf)
    fs.mkdirs(dir)
    val localFile: Option[java.io.File] =
      fs.makeQualified(lockPath).toUri match {
        case u if u.getScheme == "file" => Some(new java.io.File(u.getPath))
        case _ => None
      }
    // unique per acquisition: lets the heartbeat (and the final release)
    // verify the lock file is still OURS after a possible lease break
    val token = java.util.UUID.randomUUID().toString
    val tokenBytes = token.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    def tryCreate(): Boolean = localFile match {
      case Some(f) =>
        // RawLocalFileSystem.create(overwrite=false) does exists()-then-
        // create — two processes can BOTH succeed in the gap and the lock
        // silently admits two writers (observed as a lost TopK append
        // under load). createNewFile is a single atomic O_EXCL open.
        if (!f.createNewFile()) false
        else {
          val out = new java.io.FileOutputStream(f)
          try {
            out.write(java.nio.ByteBuffer.allocate(8)
              .putLong(System.currentTimeMillis()).array())
            out.write(tokenBytes)
          } finally out.close()
          true
        }
      case None =>
        val out = fs.create(lockPath, false)
        try {
          out.writeLong(System.currentTimeMillis())
          out.write(tokenBytes)
        } finally out.close()
        true
    }
    def readLockToken(): Option[String] = readLockTokenAt(dir, conf)
    val leaseMs = spark.conf.get("spark.graft.pathLock.leaseMs", "120000").toLong
    val acquireTimeoutMs = spark.conf.get(
      "spark.graft.pathLock.acquireTimeoutMs", (2 * leaseMs).toString).toLong
    val deadline = System.currentTimeMillis() + acquireTimeoutMs
    var acquired = false
    while (!acquired) {
      try {
        if (tryCreate()) acquired = true
        else throw new java.io.IOException("lock held")
      } catch {
        case _: java.io.IOException =>
          val age =
            try System.currentTimeMillis() -
              fs.getFileStatus(lockPath).getModificationTime
            catch { case _: java.io.FileNotFoundException => 0L }
          if (age > leaseMs) {
            // the holder's heartbeat is STALE (a live holder refreshes
            // every leaseMs/4) — presume it dead and break the lease via
            // atomic rename to a unique tombstone: of N waiters that all
            // observed the stale lock, only the rename winner removes it.
            // A plain delete races — waiter A deletes and re-creates, then
            // waiter B's in-flight delete removes A's FRESH lock and two
            // writers enter the section.
            val tomb = new org.apache.hadoop.fs.Path(dir,
              s"_graft.lock.tomb-${java.util.UUID.randomUUID().toString.take(8)}")
            try {
              if (fs.rename(lockPath, tomb)) fs.delete(tomb, false)
            } catch { case _: java.io.IOException => /* another breaker won */ }
          } else if (System.currentTimeMillis() > deadline) {
            throw new IllegalStateException(
              s"could not acquire $lockPath within $acquireTimeoutMs ms — " +
                "a LIVE writer holds it (its heartbeat is fresh); raise " +
                "spark.graft.pathLock.acquireTimeoutMs to wait longer")
          } else Thread.sleep(50)
      }
    }
    val lost = new java.util.concurrent.atomic.AtomicBoolean(false)
    // store-level fencing: bump the monotonic epoch under the
    // just-acquired exclusivity and expose it to the critical section.
    // The bump is NOT atomic with the lock create, so the write alone is
    // not proof of tenure: a process frozen between the two can resume
    // after a successor broke its lease and clobber `_graft.fence` with
    // a DUPLICATE epoch under its own token — the live successor would
    // then fail assertStoreFence while the zombie passed, and duplicate
    // epochs would defeat readSample's quarantine. So the acquisition is
    // complete only after a post-write VERIFY of both files: (a) the
    // lock must still be ours — if not, WE are that zombie and stand
    // down before the critical section ever runs (so a published epoch
    // is unique by construction: no holder reaches `body` without having
    // seen fence==lock==its token after its write); (b) the fence must
    // carry our token — if a racing zombie clobbered US, re-bump from
    // ITS value (monotonic either way) and re-verify. Each zombie writes
    // at most once before standing down, so the loop terminates. The
    // seed on a MISSING fence file comes from the max epoch stamped into
    // existing artifact names, not 1 — restarting below live artifact
    // stamps would turn readSample's max-epoch rule against a
    // legitimate fresh republish ([[maxArtifactEpoch]]).
    val fenceEpoch = {
      var epoch = 0L
      var verified = false
      while (!verified) {
        val prev = readFenceFile(dir, conf).map(_._1)
          .getOrElse(maxArtifactEpoch(dir, conf))
        writeFenceFile(dir, prev + 1, token, conf)
        postFenceWriteHook()
        if (!readLockTokenAt(dir, conf).contains(token)) {
          throw new FencedLockException(
            s"lost $lockPath between acquiring it and publishing the " +
              "fence epoch (process stall past the lease?) — a successor " +
              "holds the store now; standing down before the critical " +
              "section")
        }
        readFenceFile(dir, conf) match {
          case Some((e, t)) if t == token => epoch = e; verified = true
          case _ => () // a zombie's stale write clobbered ours: re-bump
        }
      }
      epoch
    }
    val fenceKey = fs.makeQualified(dir).toString
    val outerHolds = fenceHolds.get()
    fenceHolds.set(outerHolds.updated(fenceKey,
      FenceHold(fenceEpoch, token, lost)))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val period = math.max(100L, leaseMs / 4)
    val hb = new Thread(() => {
      try {
        while (!stop.get && !lost.get) {
          Thread.sleep(period)
          if (heartbeatFreezeHook(lockPath.toString, token)) {
            // test hook simulating a WHOLE-PROCESS freeze: no refresh and
            // no loss detection, exactly what a VM pause looks like
          } else if (!stop.get) {
            if (readLockToken().contains(token)) {
              val now = System.currentTimeMillis()
              try {
                localFile match {
                  case Some(f) => f.setLastModified(now)
                  case None => fs.setTimes(lockPath, now, -1)
                }
              } catch { case _: java.io.IOException => /* next check decides */ }
            } else {
              // broken by a waiter that saw a stale heartbeat (we were
              // frozen past the lease) — stop refreshing what is now
              // someone else's lock and flag the release to stand down
              lost.set(true)
              log.warn(s"path lock $lockPath was lease-broken while held " +
                  "(heartbeat went stale — process stall > " +
                  s"$leaseMs ms?); in-flight writes may have interleaved " +
                  "with the new holder's")
            }
          }
        }
      } catch { case _: InterruptedException => () }
    })
    hb.setDaemon(true)
    hb.setName(s"graft-lock-heartbeat-${dir.getName}")
    hb.start()
    try body finally {
      fenceHolds.set(outerHolds)
      stop.set(true)
      hb.interrupt()
      hb.join(2000)
      // release only OUR lock: after a detected (or heartbeat-unseen but
      // token-visible) break, the file under this name is the successor's
      if (!lost.get && readLockToken().contains(token)) {
        fs.delete(lockPath, false)
      }
    }
  }

  /** The store-level fencing identity of a held path lock: the monotonic
   * acquisition epoch (from `_graft.fence`), the lock token, and the
   * heartbeat's lease-break flag. */
  private[graft] final case class FenceHold(epoch: Long, token: String,
      lost: java.util.concurrent.atomic.AtomicBoolean)

  private val fenceHolds = new ThreadLocal[Map[String, FenceHold]] {
    override def initialValue(): Map[String, FenceHold] = Map.empty
  }

  /** Test hook: a heartbeat whose (lock path, token) this predicate
   * matches behaves as a FROZEN process — neither refreshing the lease
   * nor detecting its break — so specs can reproduce the VM-pause zombie
   * scenario deterministically. */
  @volatile private[graft] var heartbeatFreezeHook: (String, String) => Boolean =
    (_, _) => false

  /** Test hook: runs between the acquire-time fence write and its
   * verification — specs inject a successor's full takeover (or a
   * zombie's clobber) into the exact window the non-atomic
   * create→bump sequence leaves open. */
  @volatile private[graft] var postFenceWriteHook: () => Unit = () => ()

  /** Test hook: runs after [[publishAppend]]'s distributed staging write,
   * before its commit-point fence re-validation — specs inject a
   * successor takeover into the job-duration window a frozen appender
   * could sleep through. */
  @volatile private[graft] var appendStagingHook: () => Unit = () => ()

  /** The fence held BY THIS THREAD for `dir` (qualified), if any — what a
   * publisher stamps its artifacts with. */
  private[graft] def heldFence(spark: SparkSession, path: String): Option[FenceHold] = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    fenceHolds.get().get(fs.makeQualified(dir).toString)
  }

  private val FenceFile = "_graft.fence"

  /** Read the token of the CURRENT `_graft.lock` holder under `dir` —
   * the lock-ownership half of the acquire-time fence verification and
   * of [[assertStoreFence]]'s clobber-repair path. `None`: no lock file
   * (or unreadable — both read as "not ours"). */
  private[graft] def readLockTokenAt(dir: org.apache.hadoop.fs.Path,
      conf: org.apache.hadoop.conf.Configuration): Option[String] = try {
    val lockPath = new org.apache.hadoop.fs.Path(dir, "_graft.lock")
    val fs = lockPath.getFileSystem(conf)
    fs.makeQualified(lockPath).toUri match {
      case u if u.getScheme == "file" =>
        val bytes = java.nio.file.Files.readAllBytes(
          new java.io.File(u.getPath).toPath)
        if (bytes.length <= 8) None
        else Some(new String(bytes, 8, bytes.length - 8,
          java.nio.charset.StandardCharsets.UTF_8))
      case _ =>
        val in = fs.open(lockPath)
        try {
          in.readLong()
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](256)
          var n = in.read(chunk)
          while (n > 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
          Some(buf.toString(java.nio.charset.StandardCharsets.UTF_8))
        } finally in.close()
    }
  } catch { case _: java.io.IOException => None }

  /** Highest fence epoch stamped into any published artifact name under
   * `dir` (`….e<N>.parquet` sample-batch/append stamps, `….f<N>` TopK
   * snapshot stamps, including `.fenced-`-quarantined spellings) — the
   * recovery seed when `_graft.fence` itself is lost (store copied, or a
   * cleanup swept the underscore file): restarting epochs at 1 while
   * artifacts retain higher stamps would make [[readSample]]'s max-epoch
   * rule quarantine a legitimate fresh republish in favor of stale
   * files. 0 when no stamped artifact exists (a genuinely fresh store). */
  private[graft] def maxArtifactEpoch(dir: org.apache.hadoop.fs.Path,
      conf: org.apache.hadoop.conf.Configuration): Long = {
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return 0L
    val pat = "\\.(?:e|f)([0-9]+)(?:\\.parquet)?$".r
    fs.listStatus(dir).foldLeft(0L) { (acc, s) =>
      pat.findFirstMatchIn(s.getPath.getName) match {
        case Some(m) => math.max(acc, m.group(1).toLong)
        case None => acc
      }
    }
  }

  private[graft] def readFenceFile(dir: org.apache.hadoop.fs.Path,
      conf: org.apache.hadoop.conf.Configuration): Option[(Long, String)] = {
    val p = new org.apache.hadoop.fs.Path(dir, FenceFile)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val props = loadPropsTornFree(p, conf)
    for {
      e <- Option(props.getProperty("epoch"))
      t <- Option(props.getProperty("token"))
    } yield (e.toLong, t)
  }

  private[graft] def writeFenceFile(dir: org.apache.hadoop.fs.Path, epoch: Long,
      token: String, conf: org.apache.hadoop.conf.Configuration): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, FenceFile)
    val tmp = new org.apache.hadoop.fs.Path(dir, FenceFile + ".tmp-" +
      java.util.UUID.randomUUID().toString.take(8))
    val fs = p.getFileSystem(conf)
    val props = new java.util.Properties()
    props.setProperty("epoch", epoch.toString)
    props.setProperty("token", token)
    val out = fs.create(tmp, true)
    try props.store(out, "graft path-lock fence") finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fs.makeQualified(p).toUri, conf)
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(p),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Commit-point validation for a publisher holding the path lock: the
   * held fence must still be the store's CURRENT one. A broken holder —
   * its heartbeat flagged the loss, or `_graft.fence` moved past its
   * epoch while it was frozen — gets a [[FencedLockException]] BEFORE the
   * mutation lands, shrinking the zombie-write window from a heartbeat
   * period to the check→rename microseconds (and [[readSample]]'s
   * epoch-stamped file quarantine covers even that residue for sample
   * batches). A caller holding NO fence (no path lock on this thread) is
   * let through unchanged — fencing guards the cross-session protocol,
   * not single-owner direct calls. */
  def assertStoreFence(spark: SparkSession, path: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    fenceHolds.get().get(fs.makeQualified(dir).toString).foreach { h =>
      def boom(cause: String): Nothing =
        throw new FencedLockException(
          s"store fence for $path moved past this holder (epoch " +
            s"${h.epoch}): $cause — the lease was broken while this " +
            "process was stalled; standing down instead of interleaving " +
            "with the successor's writes")
      if (h.lost.get()) boom("heartbeat flagged the lease break")
      readFenceFile(dir, conf) match {
        case Some((e, t)) if e == h.epoch && t == h.token => ()
        case Some((e, t)) if e == h.epoch &&
            readLockTokenAt(dir, conf).contains(h.token) =>
          // our epoch, a FOREIGN token, and the lock is still OURS: a
          // pre-verify zombie (frozen between its lock create and fence
          // bump, resumed after we took over) clobbered the fence with
          // its duplicate-epoch write and then stood down at its own
          // verify — it never entered its critical section, so no data
          // moved. WE are the legitimate holder; repair the fence and
          // pass rather than spuriously fencing the live writer. (A real
          // successor can never collide on the epoch: it bumps past
          // whatever the fence held, and on a lost fence file it seeds
          // from the artifact stamps — both strictly above ours.)
          log.warn(s"store fence for $path carried our epoch ${h.epoch} " +
            s"under a foreign token ($t) while we still hold the lock — " +
            "repairing a pre-verify zombie's clobber")
          writeFenceFile(dir, h.epoch, h.token, conf)
        case Some((e, _)) => boom(s"current fence epoch is $e")
        case None => boom("fence file missing")
      }
    }
  }

  /** Publish an ad-hoc (non-streaming) sample append under the held path
   * lock: stage the distributed write into a dot-prefixed directory
   * (invisible to parquet readers), re-validate the store fence AFTER
   * the write — the job-duration stretch is the longest window a frozen
   * appender could sleep through, and the single pre-write check left
   * all of it open — then rename the complete part files into place
   * stamped with the held fence epoch. A holder fenced mid-job gets a
   * [[FencedLockException]] at the commit point and lands NOTHING; the
   * residual window is the check→rename microseconds (same class as the
   * streaming publish's). Unlike a stream batch an append is never
   * republished, so readers have no same-batch epoch pair to quarantine
   * — the post-write check IS the guarantee here, and the epoch stamp in
   * the name is the forensic record. Staging leftovers (a crashed or
   * fenced appender's) are swept here: legitimate appends serialize on
   * the path lock, so any `.staging-append-*` observed under it is
   * residue — or a zombie's in-flight write, whose deletion is exactly
   * the point. */
  private[graft] def publishAppend(spark: SparkSession, path: String,
      sampled: DataFrame): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    if (fs.exists(dir)) fs.listStatus(dir).foreach { s =>
      if (s.getPath.getName.startsWith(".staging-append-")) {
        fs.delete(s.getPath, true)
      }
    }
    val id = java.util.UUID.randomUUID().toString.take(8)
    val staging = new org.apache.hadoop.fs.Path(dir, s".staging-append-$id")
    sampled.write.mode("overwrite").parquet(staging.toString)
    try {
      appendStagingHook()
      assertStoreFence(spark, path)
    } catch {
      case e: FencedLockException =>
        try fs.delete(staging, true)
        catch { case _: java.io.IOException => () /* next append sweeps */ }
        throw e
    }
    val fenceTag = heldFence(spark, path).map(f => s".e${f.epoch}")
      .getOrElse("")
    var k = 0
    fs.listStatus(staging).foreach { s =>
      if (s.getPath.getName.endsWith(".parquet")) {
        val dst = new org.apache.hadoop.fs.Path(dir,
          s"append-$id-$k$fenceTag.parquet")
        require(fs.rename(s.getPath, dst),
          s"could not publish append file $dst")
        k += 1
      }
    }
    fs.delete(staging, true)
  }

  /** The Spark session's local time zone, for wall-time string resolution
   * (public: the parser extension in `org.apache.spark.sql.graft` resolves
   * DDL epoch strings with it too). */
  def sessionZone(spark: SparkSession): java.time.ZoneId =
    java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone)

  private val WallTimeFmt = new java.time.format.DateTimeFormatterBuilder()
    .appendPattern("yyyy-MM-dd HH:mm:ss")
    .optionalStart()
    .appendFraction(java.time.temporal.ChronoField.NANO_OF_SECOND, 1, 9, true)
    .optionalEnd()
    .toFormatter

  /**
   * Parse the reference's timestamp-bound forms to epoch milliseconds
   * (reference `Utils.parseTimestamp` as used by
   * `SnappyContextAQPFunctions.scala:143-190`): `null`/empty → `dflt`
   * (open bound); a pure number is epoch ms; otherwise
   * `yyyy-MM-dd HH:mm:ss[.fff]` or `yyyy-MM-dd` resolved in `zone`.
   *
   * Callers pass the SPARK SESSION time zone: the SQL analyzer coerces a
   * timestamp-string literal in the session zone before it reaches
   * [[graft.topk.TopKRelation]], so the string API must resolve in the
   * SAME zone or `queryApproxTSTopK(name, "2024-01-02 00:00:00", ...)`
   * and `WHERE start_time = '2024-01-02 00:00:00'` silently diverge by
   * the JVM-default-vs-session offset (the SNAP-463 equivalence contract).
   */
  private[graft] def parseTimestampMs(s: String, dflt: Long,
      zone: java.time.ZoneId): Long =
    if (s == null || s.trim.isEmpty) dflt
    else {
      val t = s.trim
      try t.toLong catch {
        case _: NumberFormatException =>
          // parse the WALL time zone-free, then resolve in `zone`
          // (java.sql.Timestamp.valueOf would bind it to the JVM default)
          val ldt =
            try java.time.LocalDateTime.parse(t, WallTimeFmt)
            catch {
              case _: java.time.format.DateTimeParseException =>
                try java.sql.Date.valueOf(t).toLocalDate.atStartOfDay()
                catch {
                  case _: IllegalArgumentException =>
                    // legacy tolerance (single-digit month/day fields)
                    java.sql.Timestamp.valueOf(t).toLocalDateTime
                }
            }
          ldt.atZone(zone).toInstant.toEpochMilli
      }
    }

  /**
   * Load a Properties file tolerating the checksummed-local-FS rename
   * window: Hadoop's ChecksumFs renames a file and its `.crc` sidecar as
   * TWO operations, so a reader polling through a concurrent
   * `rename(OVERWRITE)` publish can briefly see the new data paired with
   * the old checksum (observed as a ChecksumException in the two-JVM
   * suite). The DATA rename is atomic — the bytes are always one complete
   * version — so a checksum mismatch here is a torn-sidecar signal, not
   * corruption: retry briefly for the sidecar to land, then read the same
   * bytes with verification off (fresh uncached FS instance; the shared
   * cached one must not be mutated). HDFS/object stores have no sidecars
   * and never take the fallback.
   */
  private[graft] def loadPropsTornFree(p: org.apache.hadoop.fs.Path,
      conf: org.apache.hadoop.conf.Configuration): java.util.Properties = {
    val props = new java.util.Properties()
    var attempt = 0
    while (true) {
      attempt += 1
      try {
        val in = p.getFileSystem(conf).open(p)
        try props.load(in) finally in.close()
        return props
      } catch {
        case _: org.apache.hadoop.fs.ChecksumException if attempt < 4 =>
          props.clear()
          Thread.sleep(50)
        case _: org.apache.hadoop.fs.ChecksumException =>
          props.clear()
          val fs = org.apache.hadoop.fs.FileSystem.newInstance(
            p.toUri, conf)
          try {
            fs.setVerifyChecksum(false)
            val in = fs.open(p)
            try props.load(in) finally in.close()
          } finally fs.close()
          return props
      }
    }
    props // unreachable
  }

  /** True when `path` holds persisted TopK registry metadata. */
  def topkMetaExists(path: String,
      conf: org.apache.hadoop.conf.Configuration): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path, TopkMetaFile)
    val fs = p.getFileSystem(conf)
    fs.exists(p) && fs.getFileStatus(p).isFile
  }

  /** Persisted TopK registry metadata: (option map without `__`-internal
   * keys, base-table name). For drift checks before a re-attach. The meta
   * replace is atomic on local/HDFS ([[GraftSession.saveTopK]]), but object
   * stores may still expose a brief not-found window mid-publish — retry
   * it here since drift checks run OUTSIDE [[attachTopKTable]]'s loop. */
  def readTopkMetaOptions(path: String,
      conf: org.apache.hadoop.conf.Configuration): (Map[String, String], String) = {
    val p = new org.apache.hadoop.fs.Path(path, TopkMetaFile)
    var props: java.util.Properties = null
    var attempt = 0
    while (props == null) {
      attempt += 1
      try props = loadPropsTornFree(p, conf)
      catch {
        case _: java.io.FileNotFoundException if attempt < 5 =>
          Thread.sleep(100)
      }
    }
    import scala.jdk.CollectionConverters._
    val opts = props.stringPropertyNames().asScala
      .filterNot(_.startsWith("__"))
      .map(k => k -> props.getProperty(k)).toMap
    (opts, props.getProperty("__base", ""))
  }

  private[graft] def writeSampleMeta(path: String, baseName: String,
      qcs: Seq[String], fraction: Double, reservoirSize: Int,
      conf: org.apache.hadoop.conf.Configuration,
      declaredOpts: Map[String, String] = Map.empty): Unit = {
    val props = new java.util.Properties()
    props.setProperty("baseName", baseName)
    props.setProperty("qcs", qcs.mkString(","))
    props.setProperty("fraction", fraction.toString)
    props.setProperty("reservoirSize", reservoirSize.toString)
    // the options AS DECLARED at create time (before time-slot derivation
    // merges into `qcs`) — appends validate/inherit against these, since
    // the combined qcs is not what the user ever typed
    declaredOpts.foreach { case (k, v) =>
      props.setProperty("opt." + k.toLowerCase, v)
    }
    // the sample parquet itself goes through Hadoop FS, so the metadata must
    // too — a java.io.File here would break OPTIONS(path 'hdfs://…'/'s3a://…').
    // Published via tmp + rename(OVERWRITE) like the TopK meta: the append
    // path rewrites this file while lock-free readers in other JVMs may be
    // mid-attach, and an in-place create(overwrite) would expose a
    // truncated-file window to them
    val p = new org.apache.hadoop.fs.Path(path, MetaFile)
    val tmp = new org.apache.hadoop.fs.Path(path, MetaFile + ".tmp-" +
      java.util.UUID.randomUUID().toString.take(8))
    val fs = p.getFileSystem(conf)
    val out = fs.create(tmp, true)
    try props.store(out, "graft sample registry") finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fs.makeQualified(p).toUri, conf)
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(p),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** One property from a sample's registry metadata (e.g. the per-stream
   * `__streambatch.<name>` applied-batch watermark). */
  private[graft] def readSampleMetaProp(path: String, key: String,
      conf: org.apache.hadoop.conf.Configuration): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(path, MetaFile)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p) || !fs.getFileStatus(p).isFile) return None
    Option(loadPropsTornFree(p, conf).getProperty(key))
  }

  /** Read-modify-write of one registry-metadata property, republished via
   * the same atomic tmp+rename(OVERWRITE) as [[writeSampleMeta]]. The
   * CALLER holds the path lock — the read-modify-write is only safe
   * serialized against other writers. */
  private[graft] def updateSampleMetaProp(path: String, key: String,
      value: String, conf: org.apache.hadoop.conf.Configuration): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, MetaFile)
    val fs = p.getFileSystem(conf)
    val props = loadPropsTornFree(p, conf)
    props.setProperty(key, value)
    val tmp = new org.apache.hadoop.fs.Path(path, MetaFile + ".tmp-" +
      java.util.UUID.randomUUID().toString.take(8))
    val out = fs.create(tmp, true)
    try props.store(out, "graft sample registry") finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fs.makeQualified(p).toUri, conf)
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(p),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Read-modify-write of SEVERAL registry-metadata properties in ONE
   * atomic republish (remove then set) — the legacy fence-key retirement
   * must delete the stale keys and land any migrated watermark together,
   * or a crash between two single-prop updates leaves half-retired state.
   * CALLER holds the path lock. No-op when there is nothing to change. */
  private[graft] def rewriteSampleMetaProps(path: String,
      remove: Seq[String], set: Map[String, String],
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, MetaFile)
    val fs = p.getFileSystem(conf)
    val props = loadPropsTornFree(p, conf)
    val changed = remove.count(k => props.remove(k) != null) > 0 ||
      set.exists { case (k, v) => props.getProperty(k) != v }
    if (!changed) return
    set.foreach { case (k, v) => props.setProperty(k, v) }
    val tmp = new org.apache.hadoop.fs.Path(path, MetaFile + ".tmp-" +
      java.util.UUID.randomUUID().toString.take(8))
    val out = fs.create(tmp, true)
    try props.store(out, "graft sample registry") finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fs.makeQualified(p).toUri, conf)
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(p),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  def readSampleMeta(path: String,
      conf: org.apache.hadoop.conf.Configuration)
      : Option[(String, Seq[String], Double, Int)] = {
    val p = new org.apache.hadoop.fs.Path(path, MetaFile)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p) || !fs.getFileStatus(p).isFile) return None
    val props = loadPropsTornFree(p, conf)
    Some((props.getProperty("baseName"),
      // same top-level split as option parsing: function-expression QCS
      // entries carry argument commas through the meta round-trip
      splitTopLevel(props.getProperty("qcs", "")),
      props.getProperty("fraction").toDouble,
      props.getProperty("reservoirSize").toInt))
  }

  /** The create-time DECLARED option map stored alongside a persisted
   * sample (`opt.*` meta keys; empty for pre-existing metas). */
  def readSampleDeclaredOpts(path: String,
      conf: org.apache.hadoop.conf.Configuration): Map[String, String] = {
    val p = new org.apache.hadoop.fs.Path(path, MetaFile)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p) || !fs.getFileStatus(p).isFile) return Map.empty
    val props = loadPropsTornFree(p, conf)
    import scala.jdk.CollectionConverters._
    props.stringPropertyNames().asScala
      .filter(_.startsWith("opt."))
      .map(k => k.stripPrefix("opt.") -> props.getProperty(k)).toMap
  }
}
