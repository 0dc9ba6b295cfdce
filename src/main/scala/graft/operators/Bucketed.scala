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
    * warehouse/metastore. Idempotent across SESSIONS, not just runs:
    * with an in-memory catalog, a fresh session doesn't know the table
    * but its managed-table directory survives in the warehouse path,
    * and saveAsTable then fails with LOCATION_ALREADY_EXISTS — so the
    * stale location is removed explicitly before the write.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    // parse FIRST, then quote each part: backticking the whole name
    // would treat "db.t" as a single-part identifier, dropping a
    // different table than the one whose location is deleted below
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    spark.sql(s"DROP TABLE IF EXISTS ${ident.quotedString}")
    // resolve the managed location through the catalog, not by string
    // concatenation — honors the current database and db-qualified
    // names (<warehouse>/<db>.db/<t>), where a hardcoded
    // <warehouse>/<t> would miss (or worse, hit an unrelated dir)
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key. A `merge` hint pins
    * the sort-merge-over-bucketed-scans plan by default — broadcast
    * would also avoid the shuffle but wastes the layout and stops
    * working the day the "small" side grows past the threshold; the
    * bucketed SMJ is shuffle-free at ANY size. Asserted shuffle-free in
    * BucketedSpec and inside the `q_bucketed_join` gate query.
    */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String, merge: Boolean = true): DataFrame = {
    val l = spark.table(leftTable)
    (if (merge) l.hint("merge") else l).join(spark.table(rightTable), key)
  }

  /** Count the shuffle Exchange operators in a frame's executed plan —
    * the "did this shuffle?" probe used by tests, plan audits, and the
    * q_bucketed_join gate. Looks THROUGH AdaptiveSparkPlanExec (a leaf
    * node wrapping its real subtree): under AQE a naive traversal sees
    * zero operators and every shuffle assert passes vacuously.
    */
  def countExchanges(df: DataFrame): Int = {
    def walk(plan: org.apache.spark.sql.execution.SparkPlan): Int = {
      var n = 0
      plan.foreach {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          n += walk(a.executedPlan)
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => n += 1
        case _ => ()
      }
      n
    }
    walk(df.queryExecution.executedPlan)
  }
}
