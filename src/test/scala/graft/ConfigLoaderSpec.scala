package graft

import java.nio.file.Files

import graft.config.ConfigLoader
import graft.model.NullPolicy

/** Config pipeline semantics (reference: config_loader.py). */
class ConfigLoaderSpec extends SparkSpec {

  private def writeCfg(json: String): String = {
    val f = Files.createTempFile("cfg", ".json")
    Files.writeString(f, json)
    f.toString
  }

  test("env expansion: $VAR and ${VAR}; unknown → empty (config_loader.py:63-69)") {
    val env = Map("HOST" -> "db.example", "PORT" -> "3306")
    assert(ConfigLoader.expandEnv("jdbc://$HOST:${PORT}/x", env) ==
      "jdbc://db.example:3306/x")
    assert(ConfigLoader.expandEnv("$MISSING!", env) == "!")
  }

  test("grouped sections flatten; CLI > file > env precedence") {
    val path = writeCfg(
      """{"source": {"source_table": "t1"},
        |"run": {"mode": "overwrite", "batch_size": 5000},
        |"compat": {"null_on_non_nullable": "skip"}}""".stripMargin)
    val flat = ConfigLoader.loadFlat(path, Map.empty)
    assert(flat("source_table") == "t1")
    assert(flat("mode") == "overwrite")
    val merged = ConfigLoader.merge(
      cli = Map("mode" -> "append"), file = flat,
      env = Map("mode" -> "ignored", "extra" -> "env"))
    assert(merged("mode") == "append") // CLI wins
    assert(merged("source_table") == "t1") // file beats env
    assert(merged("extra") == "env") // env fills gaps
  }

  test("per-table mapping: default ⊕ case-insensitive table override") {
    val path = writeCfg(
      """{"mappings": {
        |  "default": {"exclude": ["tmp"], "defaults": {"x": "0"}},
        |  "tables": [
        |    {"source_table": "ODS_LM_SPU",
        |     "rename": {"a": "b"},
        |     "computed": {"yw": {"func": "format", "args": ["{year}-{week:02d}"]}},
        |     "order": ["b"]}
        |  ]}}""".stripMargin)
    val plan = ConfigLoader.selectTableMapping(path, "ods_lm_spu", Map.empty)
    assert(plan.exclude == Seq("tmp")) // from default
    assert(plan.rename == Map("a" -> "b")) // from table
    assert(plan.computed.head.func == "format")
    assert(plan.order == Seq("b"))
    // non-matching table gets only the default
    val other = ConfigLoader.selectTableMapping(path, "other", Map.empty)
    assert(other.rename.isEmpty && other.exclude == Seq("tmp"))
  }

  test("compat knobs parse with reference defaults (§2.6)") {
    val c0 = ConfigLoader.compatFrom(Map.empty)
    assert(c0.preserveStringNullTokens && !c0.treatEmptyStringAsNull)
    assert(c0.nullOnNonNullable == NullPolicy.Fail && c0.nullFillSentinel == "")
    val c1 = ConfigLoader.compatFrom(Map(
      "preserve_string_null_tokens" -> "false",
      "string_null_tokens" -> "NA, missing",
      "null_on_non_nullable" -> "fill",
      "null_fill_sentinel" -> "?"))
    assert(!c1.preserveStringNullTokens)
    assert(c1.stringNullTokens == Seq("na", "missing"))
    assert(c1.nullOnNonNullable == NullPolicy.Fill && c1.nullFillSentinel == "?")
    // invalid policy coerces to fail (migrator.py:624-626)
    assert(ConfigLoader.compatFrom(Map("null_on_non_nullable" -> "explode"))
      .nullOnNonNullable == NullPolicy.Fail)
  }
}
