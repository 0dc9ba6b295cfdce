package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{VectorAgg, VectorFunctions}

/** Embedding-column utilities for training-data pipelines. */
object Embeddings {

  /** Per-group centroids via the [[graft.functions.VectorMean]] custom
    * aggregate — one fixed-size buffer per group per partition, no
    * element explosion.
    */
  def centroids(df: DataFrame, keyCol: String, vecCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(VectorAgg.vectorMean(col(vecCol)).as("centroid"),
        count(lit(1)).as("n"))

  /** Per-group centroids with exact fixed-point accumulation
    * ([[graft.functions.VectorMeanFixed]]) — same fixed-size-buffer
    * plan shape as [[centroids]], but bit-reproducible under any
    * partitioning / retry / merge order, which is what a training-data
    * pipeline needs when centroids feed downstream dedup decisions that
    * must replay identically.
    */
  def centroidsFixed(df: DataFrame, keyCol: String,
      vecCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(VectorAgg.vectorMeanFixed(col(vecCol)).as("centroid"),
        count(lit(1)).as("n"))

  /** L2 norm of a float vector (sequential double accumulation). */
  def l2Norm(c: Column): Column = sqrt(VectorFunctions.dotProduct(c, c))

  /** L2 norm of an array<double> (e.g. a centroid) — tiny cardinality,
    * expression path is fine.
    */
  def l2NormD(c: Column): Column =
    sqrt(aggregate(c, lit(0.0), (acc, x) => acc + x * x))

  /** Unit-normalize a float vector (zero vectors pass through). */
  def normalize(c: Column): Column = {
    val norm = l2Norm(c)
    when(norm === 0.0, c)
      .otherwise(transform(c, x => (x / norm).cast("float")))
  }

  /** Distance of each row's vector to its group centroid — outlier
    * signal for embedding-quality filtering. Broadcast the (small)
    * centroid table; one narrow pass over the corpus.
    */
  def centroidDistance(df: DataFrame, keyCol: String, vecCol: String): DataFrame = {
    val cents = centroids(df, keyCol, vecCol)
      .select(col(keyCol), transform(col("centroid"),
        x => x.cast("float")).as("centroid"))
    df.join(broadcast(cents), keyCol)
      .withColumn("cosine_to_centroid",
        VectorFunctions.cosineSim(col(vecCol), col("centroid")))
      .drop("centroid")
  }
}
