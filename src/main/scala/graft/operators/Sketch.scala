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

  // ---- Portable deterministic HLL ---------------------------------------
  //
  // Same register/estimator math as Flajolet et al.'s HyperLogLog, but
  // every ingredient is deliberately cross-engine replicable (the same
  // trick that oracles the minhash/simhash gates): the value hash is the
  // md5-prefix base (`('0x'||substr(md5(v),1,15))::BIGINT` in any SQL
  // engine), rho comes from `length(bin(r))` (identical minimal binary
  // strings in Spark and DuckDB), and the harmonic sum is kept in EXACT
  // scaled-integer arithmetic (sum of 2^(49-rho) as BIGINT — order-
  // independent, unlike a float sum of 2^-rho whose 61-bit exponent
  // spread rounds), so the entire distributed pipeline — hash, register
  // max, cross-group merge — is bit-checkable by the external oracle.
  // Only the final scalar estimate touches doubles, emitted rounded to
  // BIGINT so a 1-ulp ln() divergence between libm implementations
  // cannot surface (it would need to land within ~1e-12 of a .5
  // boundary).

  /** p=12 -> m=4096 registers; 60-bit hash = 12 index + 48 rho bits. */
  val PortableM = 4096
  private val PortableEmptyTerm = 562949953421312L // 2^49 = scaled 2^-0
  /** alpha_m * m^2 * 2^49 for m=4096 collapsed to ONE double literal so
    * both engines parse the identical constant (no cross-engine
    * re-derivation of 0.7213/(1+1.079/m)). */
  private val PortableC = 6.810691763087074e21

  /** Portable HLL register table `(group, reg, rho)` — the storable
    * mergeable sketch in long form (vs [[hllSketches]]' opaque
    * DataSketches binary). At most m=4096 rows per group regardless of
    * cardinality; merge across groups/days/shards = `max(rho)` per
    * register, which is associative, so partial register tables roll up
    * without touching raw data — the same stored-sketch contract as the
    * binary form, in plain columns any engine can verify.
    */
  def portableRegisters(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull) // distinct-count semantics: NULLs don't count
      .select(col(groupCol),
        expr(s"cast(conv(substr(md5(cast($valueCol as string)),1,15)," +
          "16,10) as bigint)").as("_h"))
      .select(col(groupCol), expr("shiftright(_h, 48)").as("reg"),
        expr("_h & 281474976710655").as("_r"))
      .groupBy(col(groupCol), col("reg"))
      .agg(max(expr(
        "CASE WHEN _r = 0 THEN 49 ELSE 49 - length(bin(_r)) END"))
        .as("rho"))

  /** Standard HLL estimator over a register table, all pre-estimate
    * state exact integers: scaled harmonic sum S = sum(2^(49-rho)) +
    * V*2^49 (BIGINT, no overflow: <= 4096*2^49 = 2^61), zero-register
    * count V, raw estimate alpha*m^2*2^49/S (one IEEE division), linear
    * counting m*ln(m/V) below 2.5m. Emits the estimate plus (S, V) so
    * the oracle pins the full register pipeline bit-exactly.
    */
  private def portableEstimate(regs: DataFrame,
      keys: Seq[String]): DataFrame = {
    // coalesce: an EMPTY register table (no input rows) must yield the
    // all-empty-registers state (hsum = m*2^49, V = m), which the
    // linear-counting branch maps to estimate 0 — not NULL
    val grouped = regs.groupBy(keys.map(col): _*).agg(
      (coalesce(sum(expr("shiftleft(cast(1 as bigint), 49 - rho)")),
        lit(0L)) +
        (lit(4096L) - count(lit(1))) * lit(PortableEmptyTerm)).as("hsum"),
      (lit(4096L) - count(lit(1))).as("v"))
    val raw = lit(PortableC) / col("hsum").cast("double")
    val est = when(raw <= lit(10240.0) && col("v") > lit(0L),
      lit(4096.0) * log(lit(4096.0) / col("v").cast("double")))
      .otherwise(raw)
    grouped.select(keys.map(col) ++ Seq(
      round(est).cast("bigint").as("n_distinct_approx"),
      col("hsum").as("harmonic_sum_scaled"),
      col("v").as("zero_registers")): _*)
  }

  /** Per-group approximate distinct via the portable HLL. Note: a
    * group whose values are ALL NULL contributes no registers and is
    * absent from the output (its distinct count of non-null values is
    * 0) — same information, minus an explicit zero row.
    */
  def portableDistinct(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame =
    portableEstimate(portableRegisters(df, groupCol, valueCol),
      Seq(groupCol))

  /** Roll per-group portable register tables up to ONE estimate —
    * reads <= |groups|*4096 register rows, never the raw data.
    */
  def portableRollup(registers: DataFrame): DataFrame =
    portableEstimate(
      registers.groupBy(col("reg")).agg(max(col("rho")).as("rho")),
      Seq.empty)

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
