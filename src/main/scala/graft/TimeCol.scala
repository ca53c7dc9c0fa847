package graft

import org.apache.spark.sql.types._

/**
 * Canonical handling of time-series columns across the engine.
 *
 * The reference accepts BOTH integer-epoch and timestamp-typed time columns
 * in its TopK / stream / stratification paths (key+time extraction in
 * `execution/TopKWrapper.scala:105-116`, timestamp parsing in
 * `approximate/TopKUtil.scala`); every site here funnels through this object
 * so the two encodings stay interchangeable:
 *
 *  - `TIMESTAMP_NTZ` (what parquet `timestamp[us]` loads as) is read as a
 *    UTC wall time via `timestampdiff(MICROSECOND, epoch, col)` — pure
 *    wall-clock arithmetic, no zone rules at all. Deliberately NOT a bare
 *    `CAST(col AS TIMESTAMP)` and NOT `to_utc_timestamp(col, 'UTC')`:
 *    both implicitly render the wall time in the SESSION time zone first
 *    (verified against Spark 4.1), which would make slot boundaries
 *    depend on driver configuration.
 *  - `TIMESTAMP` is already an instant; `unix_micros` is exact.
 *  - Integral columns are interpreted per the user-declared `timeUnit`
 *    (`ns` | `ms` | `s`; default millis). All arithmetic stays in integer
 *    `div` — nanosecond epochs exceed 2^53, where double division
 *    quantizes to ~256 ns and mis-buckets events at interval boundaries.
 *
 * Slot/interval indexes are epoch-micros `div` (intervalMs * 1000), which
 * for positive epochs equals millis `div` intervalMs — so bucket indexes
 * line up with millisecond query bounds regardless of the storage type.
 */
object TimeCol {

  /** True for column types this object can normalize to an epoch. */
  def isTimeTyped(dt: DataType): Boolean = dt match {
    case TimestampNTZType | TimestampType | DateType => true
    case _ => false
  }

  /**
   * SQL fragment yielding exact epoch MICROSECONDS for column `col` of type
   * `dt`, independent of the session time zone. Integral columns are
   * interpreted per `unit` ("ns" | "ms" | "s"; anything else = millis).
   */
  def epochMicrosSql(col: String, dt: Option[DataType], unit: String = "ms"): String =
    dt match {
      case Some(TimestampNTZType) =>
        s"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', $col)"
      case Some(TimestampType) => s"unix_micros($col)"
      case Some(DateType) => s"(unix_date($col) * 86400000000L)"
      case _ => unit match {
        case "ns" => s"(CAST($col AS BIGINT) div 1000L)"
        case "s" => s"(CAST($col AS BIGINT) * 1000000L)"
        case _ => s"(CAST($col AS BIGINT) * 1000L)"
      }
    }

  /**
   * SQL fragment yielding the slot/interval index (`epochMs div
   * intervalMs`, computed in micros for exactness) for a time column of
   * any supported type.
   */
  def slotSql(col: String, dt: Option[DataType], unit: String,
      intervalMs: Long): String =
    s"(${epochMicrosSql(col, dt, unit)} div ${intervalMs * 1000L}L)"

  /**
   * SQL fragment converting a time column of any supported type to a
   * session-tz-independent `TIMESTAMP` instant (for streaming windows,
   * watermarks, and window-start extraction).
   */
  def asInstantSql(col: String, dt: DataType, unit: String = "ns"): String =
    dt match {
      // already an instant; wrapping in timestamp_micros(unix_micros(..))
      // would be the identity
      case TimestampType => col
      // every other case is exactly "micros → instant": one dispatch lives
      // in epochMicrosSql so a new type/unit can't drift between the two.
      // NOTE the integral default differs deliberately: slot bucketing
      // sites historically carried ms epochs, streaming callers ns — both
      // always pass `unit` explicitly (callers audited; keep doing so).
      case _ => s"timestamp_micros(${epochMicrosSql(col, Some(dt), unit)})"
    }
}
