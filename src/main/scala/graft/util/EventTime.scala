package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Schema-adaptive event-time normalization for the `events` fixture.
  *
  * The driver-generated `events.parquet` has shipped `ts` under two
  * different physical types across fixture generations:
  *
  *  - parquet `TIMESTAMP(NANOS)` — unreadable as a Spark timestamp, so
  *    sessions set `spark.sql.legacy.parquet.nanosAsLong=true` and the
  *    column arrives as `LongType` epoch **nanoseconds**;
  *  - parquet `TIMESTAMP(MICROS, isAdjustedToUTC=false)` — arrives as
  *    `TIMESTAMP_NTZ` (no conversion; `nanosAsLong` only affects NANOS).
  *
  * Every event query keys on whole **epoch seconds** (`sec`), and the
  * DuckDB oracle derives the same via `floor(epoch(ts))::BIGINT`, so
  * this helper is the single place that truncation happens. All graft
  * sessions pin `spark.sql.session.timeZone=UTC`, which makes the
  * NTZ→epoch interpretation identical to DuckDB's (naive timestamps
  * read as UTC wall-clock). Fixture times are post-1970, so floor and
  * truncation-toward-zero agree.
  */
object EventTime {

  /** Epoch-seconds column derived from `df`'s `tsCol`, whatever
    * physical type the fixture generation used. */
  def epochSec(df: DataFrame, tsCol: String = "ts"): Column =
    df.schema(tsCol).dataType match {
      case LongType =>
        expr(s"$tsCol div 1000000000") // epoch nanos (legacy nanosAsLong read)
      case TimestampType | TimestampNTZType =>
        unix_timestamp(col(tsCol)) // truncates sub-second micros, UTC session tz
      case other =>
        throw new IllegalArgumentException(
          s"events.$tsCol has unsupported type $other; expected long nanos or timestamp")
    }

  /** `df` with a `sec` (epoch seconds, LongType) column appended. */
  def withEpochSec(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.withColumn("sec", epochSec(df, tsCol).cast(LongType))
}
