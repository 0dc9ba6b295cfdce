package graft.model

/** Core domain model for the migration engine.
  *
  * Mirrors the reference's capability contract (SURVEY.md §0.1, §2.5-2.6;
  * reference: /root/reference/migrator.py:23-27, config.py:26-72) as plain
  * Scala data. All plan-time; no Spark types here.
  */

/** A column as described by the SOURCE catalog — the single source of type
  * truth (reference: maxcompute_client.py:79-95). Types are catalog type
  * strings ("bigint", "decimal(10,2)", "array<string>", ...), never
  * inferred from data.
  */
final case class SourceColumn(
    name: String,
    typeName: String,
    comment: Option[String] = None,
    isPartition: Boolean = false)

/** A column as described by the DESTINATION catalog
  * (reference: mysql_writer.py:69-96 — information_schema read). The
  * `comment` carries the source column description into sink DDL, like
  * the reference carried comment→SchemaField.description into BigQuery
  * (reference: bigquery_client.py:88-112, schema_mapper.py:30-37).
  */
final case class DestColumn(
    name: String,
    typeName: String,
    nullable: Boolean = true,
    default: Option[String] = None,
    comment: Option[String] = None)

/** Write mode (reference: migrator.py:23-27 plus the BigQuery
  * write_disposition surface, bigquery_client.py:152-176 —
  * WRITE_APPEND / WRITE_TRUNCATE / WRITE_EMPTY map to
  * append / overwrite / error_if_exists).
  */
sealed abstract class WriteMode(val name: String)
object WriteMode {
  case object Append extends WriteMode("append")
  case object Overwrite extends WriteMode("overwrite")
  /** Refuse to write into a table that already exists — checked before
    * any data moves.
    */
  case object ErrorIfExists extends WriteMode("error_if_exists")
  def parse(s: String): WriteMode = s.trim.toLowerCase match {
    case "overwrite" | "write_truncate"                  => Overwrite
    case "error_if_exists" | "errorifexists" | "error" |
         "write_empty"                                   => ErrorIfExists
    case _                                               => Append
  }
}

/** Policy when a non-nullable destination column holds NULLs
  * (reference: migrator.py:616-679; invalid values coerce to Fail,
  * migrator.py:624-626).
  */
sealed abstract class NullPolicy(val name: String)
object NullPolicy {
  case object Fail extends NullPolicy("fail")
  case object Fill extends NullPolicy("fill")
  case object Skip extends NullPolicy("skip")
  def parse(s: String): NullPolicy = s.trim.toLowerCase match {
    case "fill" => Fill
    case "skip" => Skip
    case _      => Fail
  }
}

/** One computed column: whitelisted function + args
  * (reference: migrator.py:875-977; README.md:265-321). Args may name
  * existing columns (then the column value is used) or be literals.
  */
final case class ComputedColumn(name: String, func: String, args: Seq[String])

/** Declarative column-mapping layer (reference: migrator.py:827-871).
  * Applied in order: include/exclude → rename → computed → defaults →
  * order. All column matching is case-insensitive, like the reference.
  */
final case class MappingPlan(
    include: Option[Seq[String]] = None,
    exclude: Seq[String] = Nil,
    rename: Map[String, String] = Map.empty,
    computed: Seq[ComputedColumn] = Nil,
    defaults: Map[String, String] = Map.empty,
    typeOverrides: Map[String, String] = Map.empty,
    order: Seq[String] = Nil) {
  def isEmpty: Boolean =
    include.isEmpty && exclude.isEmpty && rename.isEmpty &&
      computed.isEmpty && defaults.isEmpty && typeOverrides.isEmpty &&
      order.isEmpty
}

/** Null-token & compat policy surface (SURVEY.md §2.6;
  * reference: config.py:49-56). The dead knob
  * `string_null_tokens_case_insensitive` is intentionally not carried
  * over (SURVEY.md §2.6) — matching is always case-insensitive.
  */
final case class CompatConfig(
    preserveStringNullTokens: Boolean = true,
    stringNullTokens: Seq[String] = CompatConfig.DefaultNullTokens,
    treatEmptyStringAsNull: Boolean = false,
    nullOnNonNullable: NullPolicy = NullPolicy.Fail,
    nullFillSentinel: String = "")
object CompatConfig {
  /** reference: migrator.py:95-96 — 'nan','None','null','<NA>','NaN',
    * matched lowercase.
    */
  val DefaultNullTokens: Seq[String] = Seq("nan", "none", "null", "<na>")
  val default: CompatConfig = CompatConfig()
}

/** One migration run = one table copy (reference: migrator.py:122-167). */
final case class MigrationSpec(
    sourceTable: String,
    destTable: String,
    mode: WriteMode = WriteMode.Append,
    limit: Option[Long] = None,
    fullScanGuardLimit: Option[Long] = Some(100000L),
    mapping: MappingPlan = MappingPlan(),
    compat: CompatConfig = CompatConfig.default,
    dryRun: Boolean = false,
    /** Output parallelism / file sizing: repartition before the write so
      * the sink sees this many tasks (files for ParquetSink, concurrent
      * connections for JdbcSink). None = inherit upstream partitioning.
      * The scale analog of the reference's batch_size knob (README.md:90).
      */
    writePartitions: Option[Int] = None,
    /** Schema drift handling on an EXISTING destination: when true, new
      * source columns are added to the destination (nullable, no
      * default — history rows read NULL) before the load, and a source
      * column whose type no longer matches the destination fails fast.
      * When false (the reference's implicit behavior), the destination
      * schema wins and new source columns are silently dropped by the
      * projection alignment.
      */
    schemaEvolution: Boolean = false,
    /** Table-level description carried into sink DDL at creation — the
      * reference set `table.description` on the BigQuery table
      * (bigquery_client.py:90,104-105). MySQL: `COMMENT='...'` table
      * option; file sinks: a `_TABLE_COMMENT` sidecar in the table dir.
      */
    tableComment: Option[String] = None)

/** Errors — reference exceptions.py defines a small hierarchy; we keep
  * the two load-bearing ones.
  */
class DataMigrationError(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)
class MappingValidationError(msg: String) extends DataMigrationError(msg)
