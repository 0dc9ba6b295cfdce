package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign documents to
  * fixed-token-budget bins so a trainer can concatenate each bin into
  * one (mostly) full context window instead of padding short documents.
  *
  * The exact bin-packing problem is NP-hard and inherently sequential;
  * the standard large-scale compromise is streaming next-fit WITHIN A
  * SHARD: documents are walked in a deterministic order and a document
  * starts a new bin when the running token total crosses the budget.
  * Sharding first (by an existing coarse column, or a hash of the id)
  * keeps the running-sum window partitioned — each shard packs
  * independently in parallel, so the plan has no global sort and no
  * single-task window at 100 TB. Packing quality is unaffected by
  * sharding (bins never want to span shards anyway — a bin is one
  * training sequence).
  */
object Packing {

  /** Next-fit-by-start packing: within each shard, walk rows in
    * ascending id order; a row belongs to bin
    * floor((running_total_before_row) / budget). Deterministic, one
    * window per shard, no iteration. A row longer than `budget` gets a
    * bin of its own span (it starts where the cumsum reached).
    *
    * Output: (shard, id, tokens, bin) — bin ids are 0-based per shard.
    */
  def nextFitByStart(df: DataFrame, shardCol: String, idCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = Window.partitionBy(col("shard")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(shardCol).as("shard"), col(idCol).as("id"),
        col(tokensCol).cast("long").as("tokens"))
      .withColumn("cum", sum(col("tokens")).over(w))
      // double division + floor is exact here: token totals stay far
      // below 2^53, and it is the one floor-div spelling that means the
      // same thing in Spark and ANSI engines (int `/` diverges)
      .withColumn("bin",
        floor((col("cum") - col("tokens")) / lit(budget.toDouble)).cast("long"))
      .select(col("shard"), col("id"), col("tokens"), col("bin"))
  }

  /** Bin-level summary of [[nextFitByStart]]: per (shard, bin) the
    * document count, token total, and budget-fill ratio.
    */
  def packSummary(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("bin_tokens"))
      .withColumn("fill",
        (col("bin_tokens").cast("double") / lit(budget.toDouble)))
}
