package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{SketchAggregate, SketchTopK}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StringType

/**
 * Fully-distributed Structured-Streaming operators — unlike
 * [[StreamSinks]] (which mirrors the reference's driver-held TopK
 * structures), these keep all state inside Spark's streaming state store,
 * so they scale with executors and survive checkpoint recovery:
 *
 *  - [[windowedTopK]]: watermarked tumbling-window sketch aggregation; the
 *    per-window sketch is built with map-side partial merge (only fixed-size
 *    sketches shuffle) and decoded to top-k rows on executors.
 *  - [[runningCounts]]: per-key running frequencies via
 *    `flatMapGroupsWithState` — the custom-state primitive the reference's
 *    continuously-maintained "stream summary" corresponds to.
 */
object StreamOps {

  /**
   * Approximate top-k per event-time window over a (possibly streaming)
   * DataFrame. Emits one row per (window, key) with the sketch estimate,
   * in append mode once the watermark closes the window.
   *
   * Scale: the only shuffled state per window is one serialized sketch per
   * partial aggregate (a few KB), independent of key cardinality.
   */
  def windowedTopK(
      stream: DataFrame,
      keyCol: String,
      tsCol: String,
      windowDuration: String,
      watermarkDelay: String,
      k: Int = 10,
      streamSummary: Boolean = true,
      capacity: Int = 4096,
      depth: Int = 7,
      width: Int = 200,
      seed: Int = 123): DataFrame = {
    val keyIsString =
      stream.schema.find(_.name.equalsIgnoreCase(keyCol)).exists(_.dataType == StringType)
    val keyExpr =
      if (keyIsString) col(keyCol) else col(keyCol).cast("long")
    val sketch = SketchAggregate(keyExpr, lit(1L),
      if (streamSummary) "summary" else "cms", k, depth, width, capacity, seed)
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(sketch.as("__sketch__"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        explode(SketchTopK(col("__sketch__"), k, keyIsString)).as("__t__"))
      .select(col("window_start"), col("window_end"),
        col("__t__.key").as(keyCol),
        col("__t__.estimated_value").as("estimated_value"),
        col("__t__.lower_bound").as("lower_bound"))
  }

  /**
   * Exact per-key running counts over a stream with explicit state:
   * each micro-batch updates a per-key `GroupState[Long]` and emits the new
   * running total (update mode). State is partitioned by key across
   * executors and checkpointed by the engine.
   */
  def runningCounts(stream: DataFrame, keyCol: String): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val keyed: Dataset[String] =
      stream.select(col(keyCol).cast("string")).as[String]
    keyed
      .groupByKey(identity)
      .flatMapGroupsWithState[Long, (String, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[String], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          Iterator((key, n))
      }
      .toDF(keyCol, "running_count")
  }
}
