package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group outlier treatment for feature/quality columns:
  * winsorization (clamp to exact percentile-disc bounds) and
  * equi-depth decile bucketing — the two standard normalizations a
  * curation pipeline applies before thresholding on a raw signal
  * (char counts, quality scores) whose tails are garbage.
  *
  * Exactness: bounds are PERCENTILE-DISC (an actual data value at an
  * integer rank — `(cnt·p + 99) div 100`, pure integer arithmetic), so
  * no interpolation float ever exists; the clamp is least/greatest on
  * original values; buckets are `ntile`, identical by definition in
  * any ANSI engine given the same (value, tiebreak) order. Everything
  * is engine-exact — the gate hashes raw values.
  *
  * Scale: one window sort per group (rank + cnt + ntile share it) and
  * one broadcast-sized bounds aggregate joined back on the group key.
  * Exact rank quantiles sort each group once — same contract as the
  * profiler's exact quantiles; at 100 TB use [[winsorizeApprox]],
  * which swaps the window sort for an approx_percentile sketch
  * aggregate and keeps the clamp semantics unchanged.
  */
object Winsorize {

  /** @return input columns + (lo, hi, clamped, decile).
    *
    * NULL policy: rows with a NULL group or NULL value are DROPPED,
    * explicitly and up front. A NULL group never equi-matched the
    * bounds join anyway (silent drop before — now documented), and a
    * NULL value has no place in a rank-based clamp: Spark default-sorts
    * NULLS FIRST where DuckDB sorts NULLS LAST, so letting NULLs into
    * the window would shift every rank/decile cross-engine. The sort is
    * additionally pinned `asc_nulls_last` so the two engines agree even
    * if the filter is ever relaxed.
    */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String, pLow: Int = 10, pHigh: Int = 90): DataFrame = {
    require(0 < pLow && pLow < pHigh && pHigh <= 100,
      s"invalid percentile bounds: $pLow/$pHigh")
    val byVal = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol).asc_nulls_last, col(tieCol).asc_nulls_last)
    val grp = Window.partitionBy(col(groupCol))
    val ranked = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .withColumn("__rk", row_number().over(byVal))
      .withColumn("__cnt", count(lit(1)).over(grp))
      .withColumn("decile", ntile(10).over(byVal))
    val loRk = expr(s"(__cnt * $pLow + 99) div 100")
    val hiRk = expr(s"(__cnt * $pHigh + 99) div 100")
    val bounds = ranked.groupBy(col(groupCol)).agg(
      max(when(col("__rk") === loRk, col(valueCol))).as("lo"),
      max(when(col("__rk") === hiRk, col(valueCol))).as("hi"))
    ranked.join(bounds, groupCol)
      .withColumn("clamped",
        least(greatest(col(valueCol), col("lo")), col("hi")))
      .drop("__rk", "__cnt")
  }

  /** The 100 TB variant the exact path's doc promises: bounds and
    * decile cuts come from ONE `approx_percentile` (GK sketch, rank
    * error <= n/accuracy per group) hash aggregate instead of a
    * per-group window sort, and the decile is a searchsorted against
    * the 9 approximate cut points instead of `ntile`. Plan shape:
    * partial+final aggregate (map-side combinable sketch merge) + a
    * broadcast of the per-group bounds row back onto the fact — NO
    * per-group total sort anywhere, so group size no longer bounds a
    * single task's sort buffer. Same output columns as [[winsorize]];
    * clamp semantics identical (least/greatest on original values).
    *
    * Same NULL policy as the exact path: NULL group/value rows are
    * dropped up front. Not gate-oracled (the sketch's picked elements
    * are engine-specific); WinsorizeApproxSpec bounds the rank error
    * against the exact path.
    */
  def winsorizeApprox(df: DataFrame, groupCol: String, valueCol: String,
      pLow: Int = 10, pHigh: Int = 90, accuracy: Int = 10000): DataFrame = {
    require(0 < pLow && pLow < pHigh && pHigh <= 100,
      s"invalid percentile bounds: $pLow/$pHigh")
    require(accuracy > 0, s"invalid accuracy: $accuracy")
    val pcts = array(
      (Seq(pLow / 100.0, pHigh / 100.0) ++ (1 to 9).map(_ / 10.0))
        .map(lit): _*)
    val cleaned = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
    val bounds = cleaned.groupBy(col(groupCol))
      .agg(percentile_approx(col(valueCol), pcts, lit(accuracy)).as("__q"))
      .select(col(groupCol), col("__q").getItem(0).as("lo"),
        col("__q").getItem(1).as("hi"),
        slice(col("__q"), 3, 9).as("__cuts"))
    cleaned.join(broadcast(bounds), groupCol)
      .withColumn("clamped",
        least(greatest(col(valueCol), col("lo")), col("hi")))
      .withColumn("decile",
        (lit(1) + aggregate(col("__cuts"), lit(0),
          (acc, c) => acc + when(col(valueCol) > c, lit(1)).otherwise(lit(0))))
          .cast("int"))
      .drop("__cuts")
  }
}
