package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.functions.TimeFunctions

/** epochMicros contract: identical epoch extraction for instant and
  * wall-clock (NTZ) timestamps under the UTC session, and a LOUD
  * analysis failure — never a silent seconds-vs-micros reinterpretation
  * — for non-timestamp input (the hazard a blanket cast reintroduces).
  */
class TimeFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val micros = Seq(0L, 1L, 999999L, 1700000000000000L,
    -62135596800000000L /* 0001-01-01 */)

  test("instant and NTZ timestamps extract identical epoch micros (UTC)") {
    val base = micros.toDF("us")
    val instant = base.select(timestamp_micros($"us").as("ts"), $"us")
    val ntz = base.select(
      timestamp_micros($"us").cast("timestamp_ntz").as("ts"), $"us")
    for (df <- Seq(instant, ntz)) {
      val got = df.select(TimeFunctions.epochMicros(df, "ts").as("got"), $"us")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      got.foreach { case (g, expected) => assert(g == expected) }
    }
  }

  test("non-timestamp ts input fails analysis instead of silently casting") {
    val longs = Seq(1700000000000000000L).toDF("ts")
    val e = intercept[AnalysisException] {
      longs.select(TimeFunctions.epochMicros(longs, "ts")).collect()
    }
    assert(e.getMessage.contains("unix_micros"))
  }
}
