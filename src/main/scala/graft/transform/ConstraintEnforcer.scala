package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{DataMigrationError, DestColumn, NullPolicy}

/** Destination-schema alignment, DB-default fill, and non-nullable
  * enforcement (SURVEY.md §2.2 P4/P7, §2.5 D2/D3;
  * reference: migrator.py:320-337, 509-679).
  */
object ConstraintEnforcer {

  /** P4: keep only columns present at the destination, reordered to
    * destination ordinal order, case-insensitive
    * (reference: migrator.py:320-325).
    */
  def projectToDestination(df: DataFrame, dest: Seq[DestColumn]): DataFrame = {
    val byLower = df.columns.map(c => c.toLowerCase -> c).toMap
    val cols = dest.flatMap(d => byLower.get(d.name.toLowerCase))
    df.select(cols.toIndexedSeq.map(col): _*)
  }

  private val TemporalTypes =
    Set("date", "datetime", "timestamp", "time", "year")
  private val StringyTypes =
    Set("char", "varchar", "text", "tinytext", "mediumtext", "longtext",
      "blob", "tinyblob", "mediumblob", "longblob", "enum", "set")

  private def baseType(t: String): String =
    t.trim.toLowerCase.takeWhile(ch => ch.isLetter)

  /** D2: coerce a destination catalog DEFAULT literal into a Column by
    * destination type (reference: migrator.py:509-593). Handles int/float/
    * bool, MySQL `bit` literals (b'0'/b'1'/hex/0x../decimal, fallback 0),
    * and temporal `CURRENT_TIMESTAMP`/`NOW()` → current_timestamp().
    */
  def coerceDefault(raw: String, destType: String): Column = {
    val bt = baseType(destType)
    val v = raw.trim
    bt match {
      case "bigint" | "int" | "integer" | "smallint" | "tinyint" | "mediumint" =>
        lit(v).try_cast("long")
      case "double" | "float" | "decimal" | "numeric" | "real" =>
        lit(v).try_cast("double")
      case "bit" =>
        val BitRe = """(?i)b'([01]+)'""".r
        val HexRe = """(?i)(?:0x)([0-9a-f]+)""".r
        val parsed: Long = v match {
          case BitRe(bits) => java.lang.Long.parseLong(bits, 2)
          case HexRe(hex)  => java.lang.Long.parseLong(hex, 16)
          case d if d.nonEmpty && d.forall(_.isDigit) => d.toLong
          case _ => 0L // fallback (reference: migrator.py:566)
        }
        lit(parsed)
      case "bool" | "boolean" =>
        graft.functions.MigrateFunctions.lenientBool(lit(v))
      case t if TemporalTypes.contains(t) =>
        val up = v.toUpperCase
        if (up.startsWith("CURRENT_TIMESTAMP") || up.startsWith("NOW("))
          current_timestamp()
        else lit(v).try_cast("timestamp")
      case _ => lit(v)
    }
  }

  /** D2: for non-nullable destination columns carrying a catalog DEFAULT,
    * fill NULLs with the coerced default (reference: migrator.py:509-593).
    */
  def applyDbDefaults(df: DataFrame, dest: Seq[DestColumn]): DataFrame = {
    val withDefaults = dest
      .filter(d => !d.nullable && d.default.isDefined)
      .map(d => d.name.toLowerCase -> d).toMap
    if (withDefaults.isEmpty) return df
    df.select(df.schema.fields.toIndexedSeq.map { f =>
      withDefaults.get(f.name.toLowerCase) match {
        case Some(d) =>
          coalesce(col(f.name),
            coerceDefault(d.default.get, d.typeName).try_cast(f.dataType.sql))
            .as(f.name)
        case None => col(f.name)
      }
    }: _*)
  }

  /** D3: non-nullable enforcement with fail|fill|skip
    * (reference: migrator.py:616-679).
    *
    *  - Fail: ONE aggregate pass computes every null count; error message
    *    enumerates `col=count` exactly like the reference
    *    (migrator.py:662-665).
    *  - Fill: sentinel only for string/temporal/blob destination types
    *    (migrator.py:648-656). Numeric columns are NOT filled and — like
    *    the reference's fill branch, whose raise only triggers under
    *    policy='fail' — their NULLs pass through without raising here
    *    (the violation surfaces at the destination, as in the reference).
    *    For temporal columns a string sentinel like "" try_casts to NULL,
    *    which would make the fill a silent no-op, so a type-aware epoch
    *    sentinel backs it up.
    *  - Skip: drop offending rows (migrator.py:666-674).
    */
  def enforceNullPolicy(df: DataFrame, dest: Seq[DestColumn],
      policy: NullPolicy, sentinel: String = ""): DataFrame = {
    val byLower = df.columns.map(c => c.toLowerCase -> c).toMap
    val nonNullable = dest.filter(!_.nullable)
      .flatMap(d => byLower.get(d.name.toLowerCase).map(_ -> d))
    if (nonNullable.isEmpty) return df

    policy match {
      case NullPolicy.Skip =>
        df.na.drop("any", nonNullable.map(_._1))
      case NullPolicy.Fill =>
        val fillable = nonNullable.filter { case (_, d) =>
          val bt = baseType(d.typeName)
          StringyTypes.contains(bt) || TemporalTypes.contains(bt)
        }.toMap
        df.select(df.schema.fields.toIndexedSeq.map { f =>
          fillable.get(f.name) match {
            case Some(d) =>
              val typed = lit(sentinel).try_cast(f.dataType.sql)
              val bt = baseType(d.typeName)
              val withEpoch =
                if (TemporalTypes.contains(bt))
                  coalesce(typed, lit("1970-01-01 00:00:00").try_cast(f.dataType.sql))
                else typed
              coalesce(col(f.name), withEpoch).as(f.name)
            case None => col(f.name)
          }
        }: _*)
      case NullPolicy.Fail =>
        failOnNulls(df, nonNullable.map(_._1))
        df
    }
  }

  /** One-pass null-count aggregate; throws enumerating `col=count`. */
  private def failOnNulls(df: DataFrame, cols: Seq[String]): Unit = {
    val counts = nullCounts(df, cols)
    val offending = cols.zip(counts).filter(_._2 > 0)
    if (offending.nonEmpty)
      throw new DataMigrationError(
        "non-nullable columns contain NULLs: " +
          offending.map { case (c, n) => s"$c=$n" }.mkString(", "))
  }

  /** Per-column null counts in a single aggregate job. */
  def nullCounts(df: DataFrame, cols: Seq[String]): Seq[Long] = {
    val aggs: Seq[Column] =
      cols.map(c => count(when(col(c).isNull, lit(1))).as(s"n_$c"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map(row.getLong)
  }
}
