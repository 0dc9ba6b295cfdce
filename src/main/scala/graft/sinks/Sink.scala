package graft.sinks

import org.apache.spark.sql.DataFrame

import graft.model.{DestColumn, WriteMode}

/** The ONE real sink interface the reference never quite had
  * (SURVEY.md §0.2: the duck-typed `write_dataframe` vs
  * `load_data_from_dataframe` mismatch would AttributeError on the
  * BigQuery path; the intended design per
  * MYSQL_DESTINATION_MIGRATION_PLAN.md:9-17 is exactly this trait).
  */
trait Sink {
  /** S12: connection probe. */
  def testConnection(): Boolean

  /** Dialect type mapping used when translating source schema to this
    * sink's DDL (MySQL map by default — the reference's primary sink).
    */
  def ddlType(dt: org.apache.spark.sql.types.DataType): String =
    graft.schema.SchemaMapper.toMySqlType(dt)

  /** Namespace (dataset/schema/database) creation seam — the analog of
    * the reference's create_dataset_if_not_exists
    * (bigquery_client.py:45-65). Idempotent. Called by the Migrator for
    * a qualified `ns.table` destination before any table DDL.
    */
  def ensureNamespace(namespace: String): Unit = ()

  /** S9/S11: does the destination table exist. */
  def tableExists(table: String): Boolean

  /** S9/S11: create the destination table from translated DDL columns.
    * `tableComment` is the table-level description (reference:
    * bigquery_client.py:90,104-105 `table.description`).
    */
  def createTable(table: String, columns: Seq[DestColumn],
      tableComment: Option[String] = None): Unit

  /** Table-level description read back from the destination catalog
    * (REMARKS for JDBC, sidecar for files); None when absent or the
    * dialect cannot persist one.
    */
  def tableComment(table: String): Option[String] = None

  /** Update the table-level description of an EXISTING table (an
    * Overwrite run that supplies a new comment must not silently keep
    * the old one). Returns false when the backend cannot alter table
    * comments — the caller surfaces the skip.
    */
  def setTableComment(table: String, comment: String): Boolean = false

  /** O2 overwrite semantics: MySQL truncates, BigQuery drops+recreates,
    * files overwrite in place (reference: migrator.py:210-224).
    */
  def truncateOrDrop(table: String): Unit

  /** S11: destination catalog schema (nullability + defaults) — drives
    * D2/D3 constraint enforcement. None when the table doesn't exist.
    */
  def destSchema(table: String): Option[Seq[DestColumn]]

  /** Schema evolution: append `columns` to an existing table. Columns
    * are added NULLABLE with no default — history rows must read NULL.
    * Relational sinks ALTER; file sinks need no DDL (new files carry
    * the wider schema and [[destSchema]] reads the merged union).
    */
  def addColumns(table: String, columns: Seq[DestColumn]): Unit

  /** S8/S10: the write itself. One distributed job — the reference's
    * serial batch loop collapses into this (SURVEY.md §3.1).
    */
  def write(df: DataFrame, table: String, mode: WriteMode): Unit
}
