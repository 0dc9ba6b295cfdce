package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch aggregation — the 100 TB substitute for exact
  * distinct/quantile/frequency state.
  *
  * The load-bearing property is MERGEABILITY, not just smallness: a
  * sketch per partition/day/shard can be stored compactly and rolled up
  * later without touching the raw data again, and the union of partial
  * sketches is byte-identical to the sketch of the union — so daily
  * pipelines keep (group, sketch) tables and answer "distinct users
  * this quarter" by unioning 90 rows instead of rescanning 100 TB.
  *
  * Built on the engine's native sketch aggregates (Apache DataSketches
  * HLL via `hll_sketch_agg`/`hll_union_agg`, Greenwald-Khanna via
  * `approx_percentile`, Count-Min via `count_min_sketch`) — all
  * fixed-size partial-aggregation state, no custom shuffle machinery.
  */
object Sketch {

  /** Per-group approximate distinct count via DataSketches HLL.
    * Fixed 2^lgK-bucket state per group regardless of cardinality (an
    * exact count_distinct shuffles every distinct value). DataSketches
    * is exact below its coupon capacity (~3/4·2^(lgK-4) values) and
    * within ~1.6%/sqrt(2^lgK) above it.
    */
  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String,
      lgK: Int = 14): DataFrame =
    df.groupBy(col(groupCol))
      .agg(expr(s"hll_sketch_estimate(hll_sketch_agg($valueCol, $lgK))")
        .cast("long").as("n_distinct_approx"))

  /** The storable half: one HLL sketch (binary) per group — persist
    * this as the incremental "distinct state" table.
    */
  def hllSketches(df: DataFrame, groupCol: String, valueCol: String,
      lgK: Int = 14): DataFrame =
    df.groupBy(col(groupCol))
      .agg(expr(s"hll_sketch_agg($valueCol, $lgK)").as("sketch"))

  /** Roll partial sketches up to one estimate — reads |groups| rows,
    * never the raw data. Union-then-estimate equals estimating a
    * sketch built directly over the concatenated input.
    */
  def hllRollup(sketches: DataFrame): DataFrame =
    sketches.agg(
      expr("hll_sketch_estimate(hll_union_agg(sketch, false))")
        .cast("long").as("n_distinct_approx"))

  /** Per-group quantiles via the Greenwald-Khanna summary
    * (`approx_percentile`). `accuracy` bounds the rank error at
    * n/accuracy AND the summary size; for groups with ≤ `accuracy`
    * rows GK never compresses, so the result is EXACTLY the element at
    * rank ⌈p·n⌉ (what SQL calls quantile_disc) — the gate relies on
    * this; at true scale lower `accuracy` to taste.
    */
  def quantiles(df: DataFrame, groupCol: String, valueCol: String,
      probs: Seq[Double], accuracy: Int = 1000000): DataFrame = {
    val probsSql = probs.map(p => s"${p}D").mkString("array(", ",", ")")
    df.groupBy(col(groupCol))
      .agg(expr(s"approx_percentile($valueCol, $probsSql, $accuracy)")
        .as("qs"), count(lit(1)).as("n"))
  }

  /** Count-Min frequency estimates for a candidate value list: build
    * ONE CMS over the column (fixed w×d long matrix, partial-agg
    * mergeable), then probe the candidates against it. The sketch is a
    * single bounded binary row — the only driver materialization —
    * and candidates are an explicit small list (heavy-hitter suspects),
    * so nothing here scales with |df|. Estimates overcount only:
    * true ≤ est ≤ true + eps·N with confidence `confidence`.
    */
  def cmsFrequencies(df: DataFrame, valueCol: String,
      candidates: Seq[String], eps: Double = 0.0001,
      confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    val skBytes = df
      .agg(expr(s"count_min_sketch($valueCol, ${eps}D, ${confidence}D, $seed)")
        .as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(skBytes))
    val spark = df.sparkSession
    import spark.implicits._
    candidates.map(v => (v, cms.estimateCount(v)))
      .toDF("value", "est_count")
  }
}
