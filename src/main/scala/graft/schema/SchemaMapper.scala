package graft.schema

import org.apache.spark.sql.types._

import graft.model.{DestColumn, SourceColumn}

/** Catalog type translation: source type strings ⇄ Spark `DataType` ⇄ sink
  * DDL types.
  *
  * Re-expresses the reference's schema_mapper.py (SURVEY.md §1):
  *   - integer family widens to 64-bit at the destination
  *     (schema_mapper.py:21-24, 97-98)
  *   - decimal keeps (p,s) when parseable, falls back to (18,4) for bare
  *     `decimal` on MySQL (schema_mapper.py:27, 101-102, 201-202)
  *   - string/varchar/char → STRING / VARCHAR(255) (schema_mapper.py:28-30)
  *   - unknown types fall back to string with a warning
  *     (schema_mapper.py:203-208)
  *   - duplicate column names deduped case-insensitively, keep-first
  *     (schema_mapper.py:80-92) — one layer here, not three.
  *
  * Unlike the reference, nested array/map/struct stay fully typed in Spark;
  * they only degrade to JSON TEXT at JDBC sinks (SURVEY.md §1 rows
  * array/map/struct).
  */
object SchemaMapper {

  private val DecimalRe = """decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  private val DecimalBareRe = """decimal\s*(\(\s*\d+\s*\))?""".r
  private val VarcharRe = """(?:varchar|char)\s*\(\s*(\d+)\s*\)""".r
  private val ArrayRe = """array\s*<(.+)>""".r
  private val MapRe = """map\s*<(.+)>""".r
  private val StructRe = """struct\s*<(.+)>""".r

  /** Source catalog type string → Spark DataType.
    * Reference mapping tables: schema_mapper.py:20-38 (BQ), 95-117 (MySQL).
    */
  def toSparkType(typeName: String): DataType = {
    val t = typeName.trim.toLowerCase
    t match {
      case "bigint" | "long"            => LongType
      case "int" | "integer"            => IntegerType
      case "smallint"                   => ShortType
      case "tinyint"                    => ByteType
      case "double"                     => DoubleType
      case "float"                      => FloatType
      case DecimalRe(p, s)              => DecimalType(p.toInt, s.toInt)
      case DecimalBareRe(_)             => DecimalType(18, 4)
      case "string" | "varchar" | "char" | "text" => StringType
      case VarcharRe(_)                 => StringType
      case "boolean" | "bool"           => BooleanType
      case "datetime" | "timestamp_ntz" => TimestampNTZType
      case "timestamp" | "timestamp_ltz" => TimestampType
      case "date"                       => DateType
      case "binary" | "blob" | "bytes"  => BinaryType
      case ArrayRe(inner)               => ArrayType(toSparkType(inner))
      case MapRe(inner) =>
        splitTopLevel(inner) match {
          case Seq(k, v) => MapType(toSparkType(k), toSparkType(v))
          case _         => StringType // malformed map spec → fallback
        }
      case StructRe(inner) =>
        val fields = splitTopLevel(inner).flatMap { f =>
          f.split(":", 2) match {
            case Array(n, ft) => Some(StructField(n.trim, toSparkType(ft)))
            case _            => None
          }
        }
        if (fields.nonEmpty) StructType(fields) else StringType
      case _ => StringType // unknown → string fallback (schema_mapper.py:203-208)
    }
  }

  /** Split "string,struct<a:int,b:int>" at top-level commas only. */
  private[schema] def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case '<' => depth += 1; cur += '<'
      case '>' => depth -= 1; cur += '>'
      case ',' if depth == 0 => out += cur.result().trim; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.result().trim
    out.result()
  }

  /** Spark DataType → MySQL DDL type (schema_mapper.py:95-117).
    * Integer family widens to BIGINT; array/map/struct serialize to TEXT
    * (as JSON at write time); unknown → TEXT.
    */
  def toMySqlType(dt: DataType): String = dt match {
    case LongType | IntegerType | ShortType | ByteType => "BIGINT"
    case DoubleType | FloatType                        => "DOUBLE"
    case d: DecimalType                                => s"DECIMAL(${d.precision},${d.scale})"
    case StringType                                    => "VARCHAR(255)"
    case BooleanType                                   => "TINYINT(1)"
    case TimestampNTZType                              => "DATETIME"
    case TimestampType                                 => "TIMESTAMP"
    case DateType                                      => "DATE"
    case BinaryType                                    => "BLOB"
    case _: ArrayType | _: MapType | _: StructType     => "TEXT"
    case _                                             => "TEXT"
  }

  /** Spark DataType → BigQuery-dialect type string (schema_mapper.py:20-38).
    * Kept for schema-translation parity; the offline harness writes parquet.
    */
  def toBigQueryType(dt: DataType): String = dt match {
    case LongType | IntegerType | ShortType | ByteType => "INT64"
    case DoubleType | FloatType                        => "FLOAT64"
    case _: DecimalType                                => "NUMERIC"
    case StringType                                    => "STRING"
    case BooleanType                                   => "BOOL"
    case TimestampNTZType                              => "DATETIME"
    case TimestampType                                 => "TIMESTAMP"
    case DateType                                      => "DATE"
    case BinaryType                                    => "BYTES"
    case ArrayType(inner, _)                           => s"REPEATED ${toBigQueryType(inner)}"
    case _: MapType | _: StructType                    => "RECORD"
    case _                                             => "STRING"
  }

  /** Source catalog columns → Spark StructType (partition cols carried in
    * metadata, SURVEY.md §1 row "Column metadata").
    */
  def toStructType(cols: Seq[SourceColumn]): StructType =
    StructType(dedupe(cols).map { c =>
      val mb = new MetadataBuilder().putBoolean("isPartition", c.isPartition)
      c.comment.foreach(mb.putString("comment", _))
      StructField(c.name, toSparkType(c.typeName), nullable = true, mb.build())
    })

  /** Case-insensitive keep-first dedupe (schema_mapper.py:80-92). */
  def dedupe(cols: Seq[SourceColumn]): Seq[SourceColumn] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    cols.filter(c => seen.add(c.name.toLowerCase))
  }

  /** Translate source columns to MySQL destination DDL columns, dropping
    * partition columns (never created at destination,
    * schema_mapper.py:55-57, 83-86) and honoring type overrides
    * (used verbatim in DDL, reference README.md:322-355).
    */
  def toMySqlDdl(cols: Seq[SourceColumn],
      typeOverrides: Map[String, String] = Map.empty): Seq[DestColumn] = {
    val ov = typeOverrides.map { case (k, v) => k.toLowerCase -> v }
    dedupe(cols.filterNot(_.isPartition)).map { c =>
      val t = ov.getOrElse(c.name.toLowerCase, toMySqlType(toSparkType(c.typeName)))
      DestColumn(c.name, t)
    }
  }

  /** Schema drift between what a source NOW translates to (`target`)
    * and what the destination catalog says exists (`dest`). Matching is
    * case-insensitive on the name; type comparison is on the
    * [[normalizeTypeName]] base token, because DDL strings
    * ("VARCHAR(255)") and catalog metadata ("VARCHAR") render the same
    * type differently across drivers.
    *
    *  - `added`:       in target, not in dest → candidates for ALTER ADD
    *  - `removed`:     in dest, not in target → dest keeps them; the
    *                   load fills via default/null policy (D2/D3)
    *  - `typeChanged`: same name, different base type → unsafe to load
    */
  final case class SchemaDrift(added: Seq[DestColumn],
      removed: Seq[DestColumn], typeChanged: Seq[(DestColumn, DestColumn)]) {
    def isEmpty: Boolean =
      added.isEmpty && removed.isEmpty && typeChanged.isEmpty
  }

  /** Base type token for cross-driver comparison: uppercase, strip
    * length/precision args, collapse the standard synonyms.
    */
  def normalizeTypeName(t: String): String = {
    val base = t.trim.toUpperCase.takeWhile(_ != '(').trim
    base match {
      case "INT"                              => "INTEGER"
      case "DOUBLE PRECISION"                 => "DOUBLE"
      case "CHARACTER VARYING" | "TEXT"       => "VARCHAR"
      case "NUMERIC" | "DEC"                  => "DECIMAL"
      case "BOOL"                             => "BOOLEAN"
      case other                              => other
    }
  }

  def diff(target: Seq[DestColumn], dest: Seq[DestColumn]): SchemaDrift = {
    val destByName = dest.map(c => c.name.toLowerCase -> c).toMap
    val targetNames = target.map(_.name.toLowerCase).toSet
    val added = target.filterNot(c => destByName.contains(c.name.toLowerCase))
    val removed = dest.filterNot(c => targetNames.contains(c.name.toLowerCase))
    val typeChanged = target.flatMap { t =>
      destByName.get(t.name.toLowerCase).collect {
        case d if normalizeTypeName(d.typeName) !=
          normalizeTypeName(t.typeName) => (t, d)
      }
    }
    SchemaDrift(added, removed, typeChanged)
  }
}
