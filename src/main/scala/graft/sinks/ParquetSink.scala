package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.model.{DestColumn, WriteMode}
import graft.schema.SchemaMapper

/** File-based warehouse sink — the offline stand-in for the reference's
  * BigQuery path (SURVEY.md §2.1 S8-S9). Tables are directories of
  * `format` files under `baseDir`. Overwrite maps to the atomic-ish file
  * commit protocol (drop+recreate semantics, reference:
  * migrator.py:216-224).
  *
  * Formats: parquet (default), orc, csv, json — the Spark writer handles
  * all of them identically at the plan level (the sink is a terminal
  * `FileFormatWriter` job either way); csv gets a header so the files
  * round-trip through [[graft.sources.SourceReader]].
  */
class FileSink(spark: SparkSession, baseDir: String,
    format: String = "parquet",
    options: Map[String, String] = Map.empty) extends Sink {

  // a qualified `ns.table` nests one directory level, the file-side
  // analog of a dataset/schema (reference: bigquery dataset.table)
  private def path(table: String) = s"$baseDir/${table.replace('.', '/')}"

  override def ensureNamespace(ns: String): Unit = {
    new java.io.File(s"$baseDir/$ns").mkdirs(); ()
  }

  private def formatOptions: Map[String, String] = format match {
    case "csv" => Map("header" -> "true") ++ options
    case _     => options
  }

  override def testConnection(): Boolean = {
    val d = new java.io.File(baseDir)
    d.isDirectory || d.mkdirs()
  }

  override def ddlType(dt: org.apache.spark.sql.types.DataType): String =
    SchemaMapper.toBigQueryType(dt)

  /** A table exists when its directory holds any VISIBLE entry — hidden
    * files (`_SUCCESS`, the `_TABLE_COMMENT` sidecar, dotfiles) don't
    * make a table, exactly as Spark's own file listing ignores them.
    */
  override def tableExists(table: String): Boolean = {
    val dir = new java.io.File(path(table))
    dir.exists() && Option(dir.listFiles()).exists(_.exists(f =>
      !f.getName.startsWith("_") && !f.getName.startsWith(".")))
  }

  /** Files have no standalone DDL — table creation happens at first
    * write; this validates the translated schema instead (every type must
    * map, mirroring create_table's role). A table-level description (the
    * reference's `table.description`, bigquery_client.py:90,104-105) has
    * no footer slot, so it persists as a `_TABLE_COMMENT` sidecar in the
    * table directory — underscore-prefixed files are invisible to
    * Spark/Hadoop file listings, like `_SUCCESS`.
    */
  override def createTable(table: String, columns: Seq[DestColumn],
      tableComment: Option[String]): Unit = {
    require(columns.nonEmpty, s"cannot create $table with no columns")
    tableComment.filter(_.nonEmpty).foreach { cmt =>
      val dir = java.nio.file.Paths.get(path(table))
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.write(dir.resolve("_TABLE_COMMENT"),
        cmt.getBytes("UTF-8"))
    }
  }

  override def tableComment(table: String): Option[String] = {
    val p = java.nio.file.Paths.get(path(table), "_TABLE_COMMENT")
    if (java.nio.file.Files.exists(p))
      Some(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
        .filter(_.nonEmpty)
    else None
  }

  /** Rewrite the `_TABLE_COMMENT` sidecar in place. */
  override def setTableComment(table: String, comment: String): Boolean = {
    val dir = java.nio.file.Paths.get(path(table))
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve("_TABLE_COMMENT"),
      comment.getBytes("UTF-8"))
    true
  }

  /** Overwrite wipes DATA but keeps table-level metadata (the
    * `_TABLE_COMMENT` sidecar survives), matching both MySQL TRUNCATE
    * (table options persist) and BigQuery WRITE_TRUNCATE (description
    * persists through a data overwrite).
    */
  override def truncateOrDrop(table: String): Unit = {
    val dir = new java.io.File(path(table))
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      Option(dir.listFiles())
        .foreach(_.filterNot(_.getName == "_TABLE_COMMENT").foreach(rm))
    }
  }

  /** Column comments read back from the file schema — parquet/orc
    * persist StructField metadata (incl. the `comment` key) in the file
    * footer, so descriptions round-trip without a sidecar.
    */
  override def destSchema(table: String): Option[Seq[DestColumn]] = {
    // mergeSchema: after evolution the newest files are wider than the
    // oldest — the table schema is the footer UNION, not the first file
    val readOpts = format match {
      case "parquet" | "orc" => formatOptions + ("mergeSchema" -> "true")
      case _                 => formatOptions
    }
    if (!tableExists(table)) None
    // Try: a dir holding only hidden files (sidecar/_SUCCESS after an
    // interrupted first load) has no schema to infer — treat as absent
    else scala.util.Try(spark.read.options(readOpts).format(format)
      .load(path(table)).schema.fields.toIndexedSeq.map { f =>
        DestColumn(f.name, SchemaMapper.toBigQueryType(f.dataType), f.nullable,
          None, comment = f.getComment())
      }).toOption
  }

  /** Files need no DDL for evolution: subsequent writes carry the wider
    * schema and [[destSchema]] reads the merged union; rows in old
    * files read NULL for the new columns.
    */
  override def addColumns(table: String, columns: Seq[DestColumn]): Unit = ()

  override def write(df: DataFrame, table: String, mode: WriteMode): Unit = {
    val saveMode = mode match {
      case WriteMode.Overwrite     => SaveMode.Overwrite
      case WriteMode.Append        => SaveMode.Append
      case WriteMode.ErrorIfExists => SaveMode.ErrorIfExists
    }
    df.write.options(formatOptions).mode(saveMode).format(format).save(path(table))
  }
}

/** Parquet specialization, the default destination (kept as a named class
  * for config/CLI clarity).
  */
class ParquetSink(spark: SparkSession, baseDir: String)
  extends FileSink(spark, baseDir, "parquet")
