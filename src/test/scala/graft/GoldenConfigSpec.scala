package graft

import java.nio.file.Files

import graft.config.ConfigLoader
import graft.model._
import graft.run.Migrator
import graft.sinks.{DerbyDialect, JdbcSink}
import graft.sources.SourceReader

/** Golden e2e for the reference's documented config example
  * (reference: README.md:150-216 — the `ods_lm_spu` mapping): grouped
  * config keys, env expansion, default ⊕ table mapping merge, partition
  * exclusion, rename, type_override, b'0' default, computed concat, and
  * explicit order — into a live Derby sink (MySQL stand-in).
  */
class GoldenConfigSpec extends SparkSpec {
  import spark.implicits._

  private val configJson =
    """{
      |  "source": {"project_id": "bybest", "table_name": "ods_lm_spu"},
      |  "destination": {"type": "mysql", "table_name": "lm_spu"},
      |  "run": {"mode": "overwrite", "batch_size": 100000, "dry_run": false},
      |  "compat": {"preserve_string_null_tokens": true,
      |    "string_null_tokens": ["nan","None","null","<NA>","NaN"],
      |    "null_on_non_nullable": "fail", "null_fill_sentinel": ""},
      |  "mappings": {
      |    "default": {
      |      "exclude": ["pt"],
      |      "rename": {"sku_code": "sku"},
      |      "type_override": {"sku": "VARCHAR(64)"},
      |      "defaults": {"deleted": "0"},
      |      "computed": {"skc_code": {"func": "concat", "args": ["spu_code", "-", "size"]}},
      |      "order": ["id", "sku", "skc_code", "deleted", "create_time"]
      |    },
      |    "tables": [
      |      {"source_table": "ods_lm_spu",
      |       "rename": {"sku_sabc": "sku_grade"},
      |       "type_override": {"sku_grade": "VARCHAR(8)"}}
      |    ]
      |  }
      |}""".stripMargin

  test("reference README config example runs end-to-end (golden)") {
    val cfgPath = Files.createTempFile("golden", ".json")
    Files.writeString(cfgPath, configJson)

    val flat = ConfigLoader.loadFlat(cfgPath.toString, Map.empty)
    // grouped table names normalize PREFIXED (reference
    // config_loader.py:87-88, 102-103) — no lossy collision
    assert(flat("source_table") == "ods_lm_spu")
    assert(flat("dest_table") == "lm_spu")
    assert(flat("mode") == "overwrite")
    assert(flat("string_null_tokens") == "nan,None,null,<NA>,NaN")
    val compat = ConfigLoader.compatFrom(flat)
    assert(compat.preserveStringNullTokens &&
      compat.nullOnNonNullable == NullPolicy.Fail)

    // table mapping: default ⊕ ods_lm_spu override (override wins per key)
    val plan = ConfigLoader.selectTableMapping(cfgPath.toString, "ODS_LM_SPU", Map.empty)
    assert(plan.exclude == Seq("pt"))
    assert(plan.rename == Map("sku_sabc" -> "sku_grade")) // table override replaces
    assert(plan.typeOverrides == Map("sku_grade" -> "VARCHAR(8)"))
    assert(plan.computed.map(_.name) == Seq("skc_code"))
    assert(plan.order == Seq("id", "sku", "skc_code", "deleted", "create_time"))

    // build the ods_lm_spu-shaped source table
    val srcDir = tmpDir("golden-src")
    Seq(
      (1L, "SPU001", "M", "SKU001-M", "A", 0L, "2024-01-01 00:00:00", "p1"),
      (2L, "SPU002", "L", "SKU002-L", "B", 0L, "2024-01-02 00:00:00", "p1"))
      .toDF("id", "spu_code", "size", "sku_code", "sku_sabc", "deleted",
        "create_time", "pt")
      .write.parquet(s"$srcDir/ods_lm_spu.parquet")

    val db = tmpDir("golden-derby") + "/db"
    val sink = new JdbcSink(s"jdbc:derby:$db;create=true", dialect = DerbyDialect)
    val spec = MigrationSpec(
      sourceTable = flat("source_table"),
      destTable = flat("dest_table"),
      mode = WriteMode.parse(flat("mode")),
      fullScanGuardLimit = None,
      mapping = plan, compat = compat)
    val report = new Migrator(new SourceReader(spark, srcDir), sink).migrate(spec)
    assert(report.rowsWritten == 2 && report.createdTable)

    val out = spark.read.format("jdbc")
      .option("url", s"jdbc:derby:$db").option("dbtable", "\"lm_spu\"").load()
    // golden expectations: pt gone, renames applied, computed present
    val cols = out.columns.map(_.toLowerCase).toSet
    assert(!cols.contains("pt"))
    assert(cols.contains("skc_code") && cols.contains("sku_grade"))
    val row = out.filter($"id" === 1L).collect()(0)
    assert(row.getAs[String]("skc_code") == "SPU001-M")
    assert(row.getAs[String]("sku_grade") == "A")
  }
}
