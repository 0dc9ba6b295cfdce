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
  * profiler's exact quantiles; at 100 TB swap the bounds for
  * `approx_percentile` (t-digest) and keep the clamp/bucket unchanged.
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
}
