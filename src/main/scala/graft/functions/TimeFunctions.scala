package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Timestamp plumbing shared by the time-ordered operators (Scd,
  * GapFill, EventStreams, UpsertSink).
  */
object TimeFunctions {

  /** Epoch microseconds of `df`'s timestamp column, tolerant of both
    * instant (`TimestampType`) and wall-clock (`TIMESTAMP_NTZ`) input.
    *
    * `unix_micros` itself rejects NTZ, and source data flips between the
    * two flavors depending on the parquet writer (round 7's regenerated
    * testdata switched events.ts to NTZ and broke every unguarded call
    * site). The NTZ cast reinterprets the wall clock in the session
    * zone — the identity on stored micros under the UTC session every
    * entry point pins.
    *
    * The cast is applied ONLY for NTZ, resolved from the frame's actual
    * schema: a blanket `cast(TimestampType)` would also swallow a raw
    * Long or string ts column (Long casts as SECONDS since epoch —
    * micros ~1e9× off) and turn the former loud AnalysisException into
    * silently garbage epochs. Any other input type still reaches
    * `unix_micros` unchanged and fails analysis exactly as before.
    */
  def epochMicros(df: DataFrame, tsCol: String): Column =
    df.schema(tsCol).dataType match {
      case TimestampNTZType => unix_micros(col(tsCol).cast(TimestampType))
      case _                => unix_micros(col(tsCol))
    }
}
