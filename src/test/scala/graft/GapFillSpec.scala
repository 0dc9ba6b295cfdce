package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.GapFill

/** Resample + forward fill: the as-of-join formulation matches an
  * independent window-based reference, grid geometry is exact, and slot
  * ties resolve deterministically.
  */
class GapFillSpec extends SparkSpec {
  import spark.implicits._

  private val StepSec = 21600L
  private val StepUs = StepSec * 1000000L
  private lazy val events = Tables(spark, sf001, "events")

  test("resampleFfill == independent window formulation") {
    val got = GapFill.resampleFfill(
      events, "user_id", "ts", "value", "event_id", StepSec)

    val us = unix_micros($"ts")
    val slotted = events.select($"user_id",
      (us - pmod(us, lit(StepUs))).as("slot_us"), $"ts", $"value", $"event_id")
    val perSlot = slotted.withColumn("rn", row_number().over(
        Window.partitionBy($"user_id", $"slot_us")
          .orderBy($"ts".desc, $"event_id".desc)))
      .filter($"rn" === 1).select($"user_id", $"slot_us", $"value")
    val bounds = perSlot.groupBy($"user_id")
      .agg(min($"slot_us").as("t0"), max($"slot_us").as("t1"))
    val grid = bounds.select($"user_id",
      explode(sequence($"t0", $"t1", lit(StepUs))).as("slot_us"))
    val unioned = grid
      .withColumn("side", lit(1)).withColumn("v", lit(null).cast("double"))
      .unionByName(perSlot.select($"user_id", $"slot_us",
        lit(0).as("side"), $"value".as("v")))
    val w = Window.partitionBy($"user_id").orderBy($"slot_us", $"side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = unioned
      .withColumn("vf", last($"v", ignoreNulls = true).over(w))
      .filter($"side" === 1).select($"user_id", $"slot_us", $"vf")

    assert(got.select($"user_id", $"slot_us", $"v_filled")
        .collect().map(_.toSeq).toSet ===
      expect.collect().map(_.toSeq).toSet)
  }

  test("grid geometry: exact per-key span, no nulls, is_observed exact") {
    val got = GapFill.resampleFfill(
      events, "user_id", "ts", "value", "event_id", StepSec).cache()
    assert(got.filter($"v_filled".isNull).count() === 0)
    assert(got.filter($"slot_us" % StepUs =!= 0).count() === 0)

    val perKey = got.groupBy($"user_id").agg(count(lit(1)).as("n"),
      min($"slot_us").as("t0"), max($"slot_us").as("t1"))
    assert(perKey.filter($"n" =!= ($"t1" - $"t0") / StepUs + 1).count() === 0)

    val us = unix_micros($"ts")
    val occupied = events
      .select($"user_id", (us - pmod(us, lit(StepUs))).as("slot_us"))
      .distinct().count()
    assert(got.filter($"is_observed").count() === occupied)
    got.unpersist()
  }

  test("plan: fill runs through the native as-of merge; no window over raw points") {
    val plan = GapFill.resampleFfill(
        events, "user_id", "ts", "value", "event_id", StepSec)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin")) // SparkPlan nodeName strips "Exec"
    assert(!plan.contains("Window"))
  }

  test("slot ties: later ts wins, then higher tie; gaps carry forward") {
    val tiny = Seq(
      (1L, "2024-01-01 00:00:01", 1.0, 11L),
      (1L, "2024-01-01 00:00:01", 2.0, 12L), // same ts — higher tie wins
      (1L, "2024-01-01 06:59:59", 3.0, 10L), // lone obs in the 06h slot
      (1L, "2024-01-01 18:30:00", 4.0, 13L), // 18h slot after a 12h gap
      (2L, "2024-01-02 03:00:00", 9.0, 14L)) // single-point key
      .toDF("user_id", "s", "value", "event_id")
      .withColumn("ts", to_timestamp($"s")).drop("s")
    val got = GapFill.resampleFfill(
        tiny, "user_id", "ts", "value", "event_id", StepSec)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).toSet
    def us(s: String): Long =
      java.time.Instant.parse(s).toEpochMilli * 1000L
    assert(got === Set(
      (1L, us("2024-01-01T00:00:00Z"), 2.0, true),  // equal ts: tie 12 wins
      (1L, us("2024-01-01T06:00:00Z"), 3.0, true),
      (1L, us("2024-01-01T12:00:00Z"), 3.0, false), // gap: carried forward
      (1L, us("2024-01-01T18:00:00Z"), 4.0, true),
      (2L, us("2024-01-02T00:00:00Z"), 9.0, true)))
  }
}
