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
    // repartition by the bucket key FIRST: Spark's bucket id and
    // repartition(n, col) both use Murmur3 hash mod n, so after this
    // exchange every task holds exactly one bucket's rows and writes
    // ONE file per bucket. Without it each upstream task writes its own
    // slice of every bucket — shufflePartitions × buckets small files
    // (measured at 5M docs: ~4,900 files across the index tables, and a
    // fresh-JVM cold probe dominated by per-file open/footer cost, not
    // bytes). One write-side exchange buys list+scan cost proportional
    // to buckets forever after.
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Re-attach a session to a bucketed table written by
    * [[writeBucketed]] in an EARLIER session. With a persistent
    * metastore this never runs (the entry survives); with the default
    * in-memory catalog the entry dies with the JVM while the bucketed
    * data survives in the warehouse — so a fresh session re-creates the
    * entry over the existing files (metadata-only: CREATE TABLE …
    * CLUSTERED BY … LOCATION, schema read from the parquet footers).
    * Spark's bucketed files carry their bucket id in the filename
    * (`…_00007.c000`), so the re-registered table scans bucket-aware —
    * joins on `key` stay Exchange-free, same as the writing session.
    * Returns true when the table is usable afterwards (already in the
    * catalog, or attached here); false when no data exists to attach.
    */
  def registerBucketed(spark: SparkSession, table: String, key: String,
      buckets: Int): Boolean = {
    if (spark.catalog.tableExists(table)) return true
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(loc)) return false
    val ddl = spark.read.parquet(loc.toString).schema.toDDL
    spark.sql(s"CREATE TABLE ${ident.quotedString} ($ddl) USING parquet " +
      s"CLUSTERED BY (`$key`) SORTED BY (`$key`) INTO $buckets BUCKETS " +
      s"LOCATION '${loc.toString}'")
    true
  }

  /** Drop a bucketed table AND its warehouse data. DROP TABLE alone is
    * enough for a managed table, but a [[registerBucketed]]-attached
    * one is external (CREATE … LOCATION), where DROP leaves the data
    * behind — callers that mean "remove this index" want both gone.
    */
  def dropBucketed(spark: SparkSession, table: String): Unit = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(ident))
    spark.sql(s"DROP TABLE IF EXISTS ${ident.quotedString}")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true): Unit
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
