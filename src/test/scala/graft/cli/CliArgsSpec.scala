package graft.cli

import org.scalatest.funsuite.AnyFunSuite

/** CLI argument strictness: a typo'd option must fail loudly, never be
  * silently dropped (a dropped `--dest-dir` used to send the data to a
  * default destination the user never named).
  */
class CliArgsSpec extends AnyFunSuite {

  test("parseArgs: known options parse as value or boolean flags") {
    val got = Main.parseArgs(Array(
      "--source-dir", "/data", "--dry-run", "--mode", "overwrite", "--yes"))
    assert(got == Map("source_dir" -> "/data", "dry_run" -> "true",
      "mode" -> "overwrite", "yes" -> "true"))
  }

  test("parseArgs: unknown option fails and names the offender") {
    val e = intercept[RuntimeException] {
      Main.parseArgs(Array("--dest-dir", "/tmp/x"))
    }
    assert(e.getMessage.contains("--dest-dir"))
  }

  test("every documented option is accepted") {
    Main.KnownOptions.foreach { k =>
      val got = Main.parseArgs(Array("--" + k.replace('_', '-'), "v"))
      val expectKey = Main.Aliases.getOrElse(k, k)
      assert(got == Map(expectKey -> "v"), k)
    }
  }

  test("compat options reach CompatConfig through the CLI layer") {
    // --null-policy normalizes to the key compatFrom actually reads;
    // --string-null-tokens passes through as the configured list
    val cli = Main.parseArgs(Array(
      "--null-policy", "skip",
      "--string-null-tokens", "NA , miss",
      "--preserve-string-null-tokens", "false"))
    val compat = graft.config.ConfigLoader.compatFrom(cli)
    assert(compat.nullOnNonNullable == graft.model.NullPolicy.Skip)
    assert(compat.stringNullTokens == Seq("na", "miss"))
    assert(!compat.preserveStringNullTokens)
  }
}
