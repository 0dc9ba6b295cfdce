package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-storage co-located joins — the zero-shuffle join for the
  * repeated-join workload (SURVEY.md build prompt: "bucketing for
  * co-located joins").
  *
  * Writing both sides bucketed by the join key into the warehouse means
  * every subsequent equi-join on that key runs WITHOUT an Exchange on
  * either side (SortMergeJoin over pre-bucketed scans). At 100 TB this
  * converts the dominant repeated cost (shuffling the fact table for
  * every join) into a one-time write-side cost.
  */
object Bucketed {

  /** Persist a table bucketed (and sorted) by `key` into the session
    * warehouse/metastore.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. The plan is asserted
    * shuffle-free in BucketedSpec.
    */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Count the Exchange operators in a frame's executed plan — the
    * "did this shuffle?" probe used by tests and plan audits.
    */
  def countExchanges(df: DataFrame): Int = {
    val plan = df.queryExecution.executedPlan
    var n = 0
    plan.foreach {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => n += 1
      case _ => ()
    }
    n
  }
}
