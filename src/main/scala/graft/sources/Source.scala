package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.{MigrationSpec, SourceColumn}

/** Source abstraction (SURVEY.md §2.1 S1-S7): catalog-backed tables with
  * partition-aware scan building. [[SourceReader]] is the file-backed
  * implementation; [[JdbcSource]] the relational one (the reference's
  * actual source is a remote warehouse reached by SQL).
  */
trait Source {
  /** S1: full-table scan. */
  def table(name: String): DataFrame

  /** S5: catalog schema: name/type/comment/isPartition. */
  def schemaOf(name: String): Seq[SourceColumn]

  /** Partition columns, if the layout has them. */
  def partitionColumns(name: String): Set[String]

  /** S7: connection probe. */
  def testConnection(): Boolean

  /** S6: table-access probe (`LIMIT 1`). */
  def validateAccess(name: String): Boolean =
    try { table(name).limit(1).collect(); true }
    catch { case _: Exception => false }

  /** S3/S4: latest non-null value per partition column — one aggregate
    * (reference: maxcompute_client.py:261-301).
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

  /** S2: pruned scan — latest-partition equality predicates when
    * partitioned, else the LIMIT full-scan guard
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
}
