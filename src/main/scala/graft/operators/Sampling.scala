package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg

/** Deterministic sampling operators for training-data pipelines.
  *
  * Stratified sampling ("n documents per language/source/quality
  * bucket") is how corpus mixes are rebalanced. The naive
  * `Window.partitionBy(stratum).orderBy(rand)` shapes a full sort of
  * every stratum into single tasks AND is non-reproducible; this
  * implementation reuses the bounded-heap TopKByScore aggregate (see
  * [[graft.functions.TopKAgg]]), so each input partition is pruned
  * map-side to n rows per stratum before the only shuffle, and the
  * "random" order is a deterministic hash of the id — same sample on
  * every run, every cluster size.
  */
object Sampling {

  /** Deterministic pseudo-random score from an integer id: Knuth
    * multiplicative hash modulo a prime. Values stay < 2^20, so they
    * are exact in double and reproducible in any engine's BIGINT
    * arithmetic (no 64-bit-hash-to-double precision loss).
    *
    * Reduced mod-first: (id mod p)·K ≤ 1000003·2654435761 < 2^63, so
    * the product cannot overflow for ANY bigint id — `id·K` directly
    * would overflow (and ANSI mode throws) for ids above ~3.5e9, which
    * a 100 TB corpus reaches. By congruence the result is identical.
    */
  def idScore(id: Column): Column =
    pmod(pmod(id, lit(1000003L)) * lit(2654435761L), lit(1000003L))

  /** Up to `n` rows per stratum, picked by ascending [[idScore]]
    * (ties impossible within a stratum for distinct ids below the
    * prime; the aggregate's id-ASC tiebreak covers collisions).
    * Output: (stratum, id, rank 1..n).
    */
  def stratified(df: DataFrame, stratumCol: String, idCol: String,
      n: Int): DataFrame =
    df.select(col(stratumCol).as("stratum"), col(idCol).as("id"))
      // TopKByScore keeps the HIGHEST scores — negate for ascending
      .withColumn("score", -idScore(col("id")))
      .groupBy(col("stratum"))
      .agg(TopKAgg.topKByScore(col("score"), col("id"), n).as("topk"))
      .select(col("stratum"), explode(col("topk")).as("e"))
      .select(col("stratum"), col("e.id").as("id"), col("e.rank").as("rank"))

  /** Per-group cap ("domain cap"): keep at most `n` best rows per group
    * by (`scoreCol` DESC, id ASC tiebreak) — crawl curation's per-domain
    * limit, where one hot domain can contribute billions of pages that
    * would drown the mix.
    *
    * Two-stage shape: the bounded-heap [[graft.functions.TopKAgg]]
    * aggregate prunes each input partition to ≤ n rows per group
    * map-side, so the only wide exchange carries k·groups·partitions
    * (id, score) pairs — never the documents, and never a full
    * per-group sort (the window formulation puts the entire hot domain
    * in ONE task). Full rows come back via a join on the kept ids —
    * ≤ n·|groups| rows, but deliberately NOT hint-broadcast: with
    * millions of groups (per-domain caps over the open web) the kept
    * set is itself large, and a forced broadcast would be a driver
    * OOM. AQE sees the aggregate's output size and picks the
    * broadcast side exactly when it really is small.
    *
    * Output: every `df` column plus `rank` (1..n within the group).
    */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
      score: Column, n: Int): DataFrame = {
    val kept = df
      .select(col(groupCol).as("grp"), col(idCol).as("id"),
        score.cast("double").as("score"))
      .groupBy(col("grp"))
      .agg(TopKAgg.topKByScore(col("score"), col("id"), n).as("topk"))
      .select(explode(col("topk")).as("e"))
      .select(col("e.id").as("__keep_id"), col("e.rank").as("rank"))
    df.join(kept, df(idCol) === kept("__keep_id"))
      .drop("__keep_id")
  }

  /** Deterministic train/val/test assignment by id hash — the standard
    * "split by hash, not by order" rule for training corpora (row order
    * is partition-dependent in any distributed engine; an id hash gives
    * the same membership on every run, cluster size, and engine, and
    * new rows never reshuffle old ones between splits).
    *
    * Narrow (no shuffle, no state): bucket = [[idScore]] mod 100, rows
    * with bucket < trainPct → "train", < trainPct+valPct → "val",
    * rest → "test". Adds a `split` column.
    */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int = 80,
      valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val bucket = pmod(idScore(col(idCol)), lit(100L))
    df.withColumn("split",
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Deterministic corpus mixing: keep each row with a per-group rate
    * ("domain reweighting" — downsample boilerplate-heavy sources,
    * keep the rare ones whole). Rates are integer per-mille so the
    * threshold comparison is exact integer arithmetic in any engine.
    * Narrow (filter only). Nested property: a group's 100‰ keep set is
    * a subset of its 500‰ keep set — rate changes never resample.
    */
  def weightedKeep(df: DataFrame, idCol: String, groupCol: String,
      keepPerMille: Map[String, Int],
      defaultPerMille: Int = 1000): DataFrame = {
    require((defaultPerMille +: keepPerMille.values.toSeq)
      .forall(p => p >= 0 && p <= 1000), s"per-mille rates must be 0..1000")
    val pm = pmod(idScore(col(idCol)), lit(1000L))
    val thresh = keepPerMille.toSeq.sortBy(_._1).foldLeft(
      lit(defaultPerMille)) { case (acc, (g, p)) =>
        when(col(groupCol) === g, lit(p)).otherwise(acc)
      }
    df.filter(pm < thresh)
  }

  /** LEAKAGE-SAFE train/val/test split: near-duplicate documents must
    * land in the SAME split — a near-dup pair straddling train and
    * test is evaluation leakage ([[hashSplit]] alone cannot see it).
    * Split membership keys on the document's duplicate-CLUSTER id
    * (the connected component's min member over the caller-supplied
    * near-dup pair set; singletons key on their own id), so a whole
    * cluster moves together, and — because the component label is the
    * min id, stable under growth until clusters merge — adding new
    * documents never reassigns an existing cluster across splits.
    *
    * Scale: components shuffle (id, label) pairs only
    * ([[Dedup.connectedComponents]]); the membership join keys on the
    * doc id; the split itself is the same narrow integer-hash
    * projection as [[hashSplit]].
    *
    * Output: input columns + (grp, split).
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b",
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val comps = Dedup.connectedComponents(pairs, aCol, bCol)
      .withColumnRenamed("id", "__cid")
    val grouped = df.join(comps, col(idCol) === col("__cid"), "left")
      .withColumn("grp", coalesce(col("comp"), col(idCol)))
      .drop("__cid", "comp")
    val bucket = pmod(idScore(col("grp")), lit(100L))
    grouped.withColumn("split",
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }
}
