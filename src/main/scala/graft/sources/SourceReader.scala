package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{MigrationSpec, SourceColumn}

/** Source-side scan building (SURVEY.md §2.1 S1-S7).
  *
  * The reference hand-builds SQL against MaxCompute: `SELECT * FROM t`
  * plus a partition-pruning predicate (prefer latest partition, else
  * LIMIT-guard a full scan) (reference: maxcompute_client.py:105-217).
  * Spark-first, the same contract is: read the table, attach an equality
  * filter on the partition columns — Catalyst's PruneFileSourcePartitions
  * turns that into directory pruning on Hive-layout data, so at 100 TB the
  * scan touches one partition's files only. Column pruning comes free once
  * downstream does `.select` (a strict improvement over the reference's
  * `SELECT *`, SURVEY.md §4).
  */
class SourceReader(spark: SparkSession, baseDir: String,
    format: String = "parquet") {

  /** S1: scan. Tables resolve to `baseDir/<name>.parquet` (testdata
    * layout) or `baseDir/<name>` (hive-partitioned directory).
    */
  def table(name: String): DataFrame = {
    val flat = s"$baseDir/$name.$format"
    val dir = s"$baseDir/$name"
    val path = if (exists(flat)) flat else dir
    // parquet TIMESTAMP(NANOS) columns: read as raw nanos, truncate to
    // micros at ingest (Spark's timestamp precision) — see Tables.read
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.Tables.normalizeNanos(spark.read.format(format).load(path))
  }

  private def exists(p: String): Boolean =
    new java.io.File(p).exists() ||
      org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        .exists(new org.apache.hadoop.fs.Path(p))

  /** S5: catalog schema fetch — StructType + hive partition detection. */
  def schemaOf(name: String): Seq[SourceColumn] = {
    val df = table(name)
    val partCols = partitionColumns(name)
    df.schema.fields.map { f =>
      SourceColumn(f.name, f.dataType.typeName,
        comment = if (f.metadata.contains("comment"))
          Some(f.metadata.getString("comment")) else None,
        isPartition = partCols.contains(f.name.toLowerCase))
    }.toIndexedSeq
  }

  /** Hive-style partition columns of a directory-backed table (k=v dirs). */
  def partitionColumns(name: String): Set[String] = {
    val dir = new java.io.File(s"$baseDir/$name")
    if (!dir.isDirectory) Set.empty
    else Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName)
      .filter(_.contains("=")).map(_.split("=", 2)(0).toLowerCase).toSet
  }

  /** S3/S4: latest partition value per partition column — one global
    * aggregate (`max` over every partition key at once,
    * reference: maxcompute_client.py:261-301). On a file source this is
    * metadata-only after OptimizeMetadataOnlyQuery; no data scan.
    */
  def latestPartitions(df: DataFrame, partCols: Seq[String]): Map[String, String] = {
    if (partCols.isEmpty) return Map.empty
    val filtered = partCols.foldLeft(df)((d, c) => d.filter(col(c).isNotNull))
    if (filtered.limit(1).isEmpty) return Map.empty // emptiness probe (S3)
    val aggs = partCols.map(c => max(col(c).cast("string")).as(c))
    val row = filtered.agg(aggs.head, aggs.tail: _*).head()
    partCols.zipWithIndex.flatMap { case (c, i) =>
      Option(row.getString(i)).map(c -> _)
    }.toMap
  }

  /** S2: the pruned scan. Prefer latest-partition equality predicates;
    * else guard the full scan with a LIMIT
    * (reference: maxcompute_client.py:165-217).
    */
  def buildScan(spec: MigrationSpec): DataFrame = {
    val df = table(spec.sourceTable)
    val partCols = partitionColumns(spec.sourceTable).toSeq.sorted
    val base =
      if (partCols.nonEmpty) {
        val latest = latestPartitions(df, partCols)
        if (latest.nonEmpty)
          latest.foldLeft(df) { case (d, (c, v)) =>
            d.filter(col(c).cast("string") === v)
          }
        else guard(df, spec)
      } else guard(df, spec)
    spec.limit.fold(base)(n => base.limit(n.toInt).toDF())
  }

  private def guard(df: DataFrame, spec: MigrationSpec): DataFrame =
    spec.fullScanGuardLimit match {
      case Some(n) if spec.limit.isEmpty => df.limit(n.toInt).toDF()
      case _                             => df
    }

  /** S6: table-access probe (`LIMIT 1`,
    * reference: maxcompute_client.py:303-332).
    */
  def validateAccess(name: String): Boolean =
    try !table(name).limit(1).isEmpty || true
    catch { case _: Exception => false }

  /** S7: connection test — can we list the base dir. */
  def testConnection(): Boolean =
    try { new java.io.File(baseDir).exists() }
    catch { case _: Exception => false }
}
