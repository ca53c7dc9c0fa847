package graft

import org.apache.spark.sql.DataFrame

/**
 * Reference-shaped DataFrame syntax (`import graft.implicits._`), mirroring
 * the reference's `org.apache.spark.sql.snappy._` implicits used throughout
 * its suites (`SparkSQLTest.scala:243-258`):
 *
 * {{{
 * import graft.implicits._
 * val sampled = df.stratifiedSample(Map(
 *   "qcs" -> "carrier,year", "fraction" -> 0.01, "strataReservoirSize" -> 50))
 * df.insertIntoSampleTables("my_sample")
 * df.createApproxTSTopK("topk_delay", Some("ts"), Map("key" -> "carrier"))
 * sampled.errorStats("delay", groupBy = Seq("carrier"))
 * }}}
 */
object implicits {

  implicit class SampleDataFrameOps(private val df: DataFrame) extends AnyVal {

    /** Stratified sample of this DataFrame with the reference's option map
     * (`qcs`, `fraction`, `strataReservoirSize`, `seed`,
     * `timeSeriesColumn`/`timeInterval`, `errorLimitColumn`/
     * `errorLimitPercent`/`confidence`). Values may be any type —
     * `"fraction" -> 0.01` and `"fraction" -> "0.01"` are equivalent. The
     * result carries the hidden weight column and registers as a sample
     * when queried under `WITH ERROR` (AQP-211 inline-sample rule). */
    def stratifiedSample(options: Map[String, Any]): DataFrame =
      GraftSession.sampleByOptions(df,
        options.map { case (k, v) => k -> String.valueOf(v) })._1

    /** Append this DataFrame's rows into registered sample tables, each
     * batch re-sampled per stratum (reference
     * `samplingFunctions.insertIntoSampleTables`). */
    def insertIntoSampleTables(names: String*): Unit = {
      val gs = GraftSession(df.sparkSession)
      names.foreach(n => gs.appendToSample(n, df))
    }

    /** Create + populate an approximate time-series TopK structure from
     * this DataFrame (reference `snappy.createApproxTSTopK`). Queryable via
     * `SELECT * FROM name` or `GraftSession.queryApproxTSTopK`. */
    def createApproxTSTopK(name: String, timeSeriesColumn: Option[String],
        options: Map[String, Any]): Unit = {
      val opts = options.map { case (k, v) => k.toLowerCase -> String.valueOf(v) } ++
        timeSeriesColumn.map("timeseriescolumn" -> _)
      val view = s"${name}_topk_base"
      df.createOrReplaceTempView(view)
      GraftSession(df.sparkSession).createTopK(name, view, opts)
    }

    /** Closed-form error statistics of an aggregate over a sampled
     * DataFrame (one produced by [[stratifiedSample]] — must carry the
     * weight column): estimate, absolute/relative error, bounds,
     * sample count (reference `SampleDataFrameContract.errorStats`,
     * `sql/SampleDataFrameContractImpl.scala:33-80`). */
    def errorStats(column: String, aggType: String = "sum",
        confidence: Double = 0.95, groupBy: Seq[String] = Nil): DataFrame =
      GraftSession(df.sparkSession).errorStats(df, column, aggType,
        confidence, groupBy)

    /** Rewrite this aggregation DataFrame to run against the best matching
     * sample with the requested error contract (the reference's
     * `df.withError(error, confidence, behavior)` implicit — use
     * [[graft.aqp.functions]] for error columns inside the aggregation). */
    def withError(error: Double, confidence: Double = 0.95,
        behavior: String = null): DataFrame =
      GraftSession(df.sparkSession).withError(df, error, confidence, behavior)
  }
}
