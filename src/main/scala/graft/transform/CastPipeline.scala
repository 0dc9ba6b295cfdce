package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.MigrateFunctions._
import graft.model.{CompatConfig, SourceColumn}
import graft.schema.SchemaMapper

/** Schema-driven cast pipeline (SURVEY.md §2.3, T1-T8).
  *
  * The reference's single most defended invariant: the SOURCE CATALOG type
  * decides every column's type — values are never sniffed
  * (reference: migrator.py:345-394, README.md:400-433). Each declared type
  * becomes one `try_cast`-style expression; malformed values become NULL
  * instead of failing the run (the reference's errors='coerce'), columns
  * not present in the catalog pass through untouched.
  *
  * One `.select` over all columns — a single narrow projection, fully
  * inside whole-stage codegen; at 100 TB this is a zero-shuffle map stage.
  */
object CastPipeline {

  /** T1: build the full cast projection for a DataFrame. */
  def apply(df: DataFrame, sourceCols: Seq[SourceColumn],
      compat: CompatConfig = CompatConfig.default): DataFrame = {
    val byName = sourceCols.map(c => c.name.toLowerCase -> c).toMap
    val projected = df.columns.map { name =>
      byName.get(name.toLowerCase) match {
        case Some(sc) => castColumn(col(name), sc.typeName, compat).as(name)
        case None     => col(name)
      }
    }
    df.select(projected.toIndexedSeq: _*)
  }

  /** T2-T6 dispatch: one declared-type cast expression. */
  def castColumn(c: Column, typeName: String, compat: CompatConfig): Column =
    SchemaMapper.toSparkType(typeName) match {
      case BooleanType => lenientBool(c) // T4
      case StringType  => stringPreserve(c, compat) // T5
      case dt @ (TimestampType | TimestampNTZType | DateType) =>
        c.try_cast(dt.sql) // T6 with try_cast leniency
      case BinaryType => c.cast(BinaryType)
      case dt => c.try_cast(dt.sql) // T2/T3: numeric + nested types
    }

  /** T5: string preservation — values stay strings whatever they look
    * like; literal null tokens preserved by default, stripped when
    * configured (reference: migrator.py:449-473).
    */
  def stringPreserve(c: Column, compat: CompatConfig): Column = {
    val s0 = c.cast(StringType)
    val s1 =
      if (compat.preserveStringNullTokens) s0
      else stripNullTokens(s0, compat.stringNullTokens)
    if (compat.treatEmptyStringAsNull) emptyToNull(s1) else s1 // T8
  }

  /** T7: fallback basic cleanup — ±inf → null on floating columns only
    * (reference: migrator.py:486-507).
    */
  def basicCleanup(df: DataFrame): DataFrame = {
    val projected = df.schema.fields.map { f =>
      f.dataType match {
        case DoubleType | FloatType =>
          cleanInfinities(col(f.name).cast(DoubleType)).cast(f.dataType).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(projected.toIndexedSeq: _*)
  }
}
