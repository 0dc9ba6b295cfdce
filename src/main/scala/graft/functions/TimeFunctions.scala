package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.unix_micros
import org.apache.spark.sql.types.TimestampType

/** Timestamp plumbing shared by the time-ordered operators (Scd,
  * GapFill, EventStreams, UpsertSink).
  */
object TimeFunctions {

  /** Epoch microseconds of a timestamp column, tolerant of both instant
    * (`TimestampType`) and wall-clock (`TIMESTAMP_NTZ`) inputs.
    *
    * `unix_micros` itself rejects NTZ, and source data flips between the
    * two flavors depending on the parquet writer (round 7's regenerated
    * testdata switched events.ts to NTZ and broke every unguarded call
    * site). The cast is a no-op on an already-instant column (Catalyst
    * removes the trivial cast), and on NTZ it reinterprets the wall
    * clock in the session zone — the identity on stored micros under the
    * UTC session every entry point pins.
    */
  def epochMicros(c: Column): Column = unix_micros(c.cast(TimestampType))
}
