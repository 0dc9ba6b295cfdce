package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series resample + forward fill (gap fill): per key, an evenly
  * stepped time grid from the key's first to last observation, where
  * each grid instant carries the latest observation at-or-before it —
  * pandas' `resample().last().ffill()`, the shape every metrics /
  * sensor / feature-freshness pipeline needs and Spark has no verb for.
  *
  * Plan shape (the 100 TB story):
  *   1. slot each observation to its step boundary — narrow integer
  *      arithmetic (`us - us % step`, no float detour);
  *   2. ONE map-side-combinable `max_by` aggregate compacts each
  *      (key, slot) to its last observation — the shuffle carries one
  *      row per occupied slot, never the raw points;
  *   3. per-key bounds are a second tiny aggregate (two longs per key)
  *      and the grid is a narrow `sequence()` explode off it — grid
  *      size is span/step per key, i.e. exactly the operator's OUTPUT,
  *      so no intermediate exceeds the result;
  *   4. the fill itself is the native as-of join ([[AsOf.join]] —
  *      custom Catalyst merge exec): grid and compacted observations
  *      co-partition by key, one sort each, O(1) merge state. No
  *      per-key window over raw points, no range cross-product.
  *
  * Ties inside a slot resolve by greatest (`tsCol`, `tieCol`) — make
  * `tieCol` unique (an event id) for deterministic output. Equal grid
  * and observation slots match inclusively (an observation IN slot g
  * is visible at grid point g).
  *
  * Reference anchor: the reference has no time-series surface at all
  * (its only temporal op is partition-date resolution,
  * maxcompute_client.py:176-209) — this extends the engine the way
  * training-data/metrics pipelines extended classic ETL.
  *
  * @param stepSeconds grid step; output rows per key = span/step + 1.
  * @return (keyCol, slot_us, v_filled, is_observed) — `slot_us` the
  *         grid instant in epoch micros, `v_filled` the carried value
  *         (null before the key's first observation only at step 1
  *         boundaries — the grid starts AT the first occupied slot, so
  *         in this formulation `v_filled` is never null),
  *         `is_observed` whether the slot itself contained a point.
  */
object GapFill {

  def resampleFfill(obs: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieCol: String, stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, "stepSeconds must be positive")
    val stepUs = stepSeconds * 1000000L

    val us = graft.functions.TimeFunctions.epochMicros(obs, tsCol)
    val slotted = obs.select(col(keyCol).as("k"),
      (us - pmod(us, lit(stepUs))).as("slot_us"),
      col(tsCol).as("__ts"), col(valueCol).as("__v"), col(tieCol).as("__tie"))

    // resample: last observation per occupied (key, slot) — partial-agg
    // combinable, so the shuffle moves one row per slot per map task.
    val perSlot = slotted.groupBy(col("k"), col("slot_us"))
      .agg(max_by(col("__v"), struct(col("__ts"), col("__tie"))).as("v"))

    val bounds = perSlot.groupBy(col("k"))
      .agg(min(col("slot_us")).as("t0"), max(col("slot_us")).as("t1"))
    val grid = bounds.select(col("k"),
      explode(sequence(col("t0"), col("t1"), lit(stepUs))).as("slot_us"))

    AsOf.join(grid, perSlot.withColumnRenamed("slot_us", "obs_slot_us"),
        "k", "slot_us", "obs_slot_us", Seq("v", "obs_slot_us"))
      .select(col("k").as(keyCol), col("slot_us"),
        col("asof_v").as("v_filled"),
        (col("asof_obs_slot_us") === col("slot_us")).as("is_observed"))
  }
}
