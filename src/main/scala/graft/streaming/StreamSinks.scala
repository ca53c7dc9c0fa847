package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.GraftSession
import graft.sampling.StratifiedSampler

/**
 * Structured-Streaming population of AQP structures — the Spark-native
 * replacement for the reference's DStream-based `aqpTablePopulator`
 * (`execution/SnappyContextAQPFunctions.scala:390-442`): every stream table
 * fed its dependent sample/TopK structures per micro-batch; here each
 * dependent is a `foreachBatch` sink.
 *
 * Semantics preserved from the reference:
 *  - samples are maintained per batch — the hidden weight encodes the
 *    batch's stratum totals (`DataFrameWithTime` batch semantics), so
 *    weighted estimates over the accumulated sample estimate the full
 *    stream history;
 *  - TopK structures bucket by event time (interval retention in
 *    [[graft.sketch.TimeBucketedSketch]]), so late data within retained
 *    intervals still lands in the right bucket.
 */
object StreamSinks {

  /** Attach a TopK structure (created via `createTopK` or here) as a sink of
   * a streaming DataFrame. Each micro-batch runs the distributed sketch
   * aggregation and merges interval sketches into the driver-held state. */
  def topkSink(gs: GraftSession, topkName: String, stream: DataFrame,
      options: Map[String, String] = Map.empty,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery = {
    if (!gs.state.topks.contains(topkName.toLowerCase)) {
      val opts = graft.topk.TopKOptions.fromOptions(options,
        graft.GraftSession.sessionZone(gs.spark))
      val keyField = stream.schema.find(_.name.equalsIgnoreCase(opts.key)).getOrElse(
        throw new IllegalArgumentException(s"key column ${opts.key} missing from stream"))
      val keyType = keyField.dataType match {
        case org.apache.spark.sql.types.StringType => org.apache.spark.sql.types.StringType
        case _ => org.apache.spark.sql.types.LongType
      }
      gs.state.topks.put(topkName.toLowerCase,
        new graft.topk.TopKState(topkName, opts, keyType))
    }
    stream.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        gs.appendToTopK(topkName, batch)
      }
      .start()
  }

  /**
   * Attach a streaming stratified-sample sink: each micro-batch is sampled
   * per stratum (weights encode that batch's stratum totals) and appended to
   * a parquet-backed sample table registered in the session catalog —
   * streaming equivalent of `CREATE SAMPLE TABLE s ON stream`
   * (`AQPStreamingSuite.scala:63-123`).
   */
  def sampleSink(gs: GraftSession, sampleName: String, baseName: String,
      stream: DataFrame, qcs: Seq[String], fraction: Double = 0.0,
      reservoirSize: Int = 50, path: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery = {
    val spark = gs.spark
    val q = stream.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val sampled = StratifiedSampler.sample(batch, qcs, fraction, reservoirSize,
            seed = 42L + batchId)
          sampled.write.mode("append").parquet(path)
          spark.catalog.refreshByPath(path)
          val sampleDf = spark.read.parquet(path)
          sampleDf.createOrReplaceTempView(sampleName)
          gs.state.samples.put(sampleName, graft.SampleInfo(
            sampleName, baseName,
            // the registered "base" plan for query routing is whatever the
            // caller registered under baseName (batch view of the stream)
            spark.table(baseName).queryExecution.analyzed,
            sampleDf, qcs, fraction, reservoirSize))
        }
        ()
      }
      .start()
    q
  }
}
