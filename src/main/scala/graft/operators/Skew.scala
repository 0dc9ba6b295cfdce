package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities for 100-TB joins/aggregations.
  *
  * AQE's skew-join split handles moderate skew at runtime; salting is the
  * explicit tool when one key dominates so heavily that even split
  * partitions overwhelm a task (the classic power-law key). Semantics are
  * unchanged — salting only changes the physical key distribution.
  */
object Skew {

  /** Salted inner equi-join: the skewed (large) side gets a random salt
    * in [0, saltFactor); the small side is replicated `saltFactor` times
    * so every salted key finds its match. Row multiplicity is preserved
    * exactly; only the shuffle distribution changes.
    *
    * The salt must be DETERMINISTIC per row to survive task retries —
    * derived from a hash of the whole row, not rand().
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val salted = large.withColumn("__salt",
      pmod(hash(large.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (salted partial → final) aggregation for skewed group
    * keys: count/sum-style aggregates compute per (key, salt) first, then
    * combine. Spark's hash aggregate already does map-side partials, so
    * this matters when the DISTINCT-value state per key (not row count)
    * is the bottleneck — pass the pre-aggregated columns in `partial`.
    */
  def twoPhaseAgg(df: DataFrame, key: String, saltFactor: Int,
      partial: Map[String, Column => Column],
      combine: Map[String, Column => Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val phase1 = salted.groupBy(col(key), col("__salt"))
      .agg(partial.head._2(col(partial.head._1)).as(partial.head._1),
        partial.tail.map { case (c, f) => f(col(c)).as(c) }.toSeq: _*)
    phase1.groupBy(col(key))
      .agg(combine.head._2(col(combine.head._1)).as(combine.head._1),
        combine.tail.map { case (c, f) => f(col(c)).as(c) }.toSeq: _*)
  }
}
