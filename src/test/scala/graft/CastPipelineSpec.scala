package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.model.{CompatConfig, SourceColumn}
import graft.transform.CastPipeline

/** Ports the reference's type-preservation and cast-semantics tests
  * (reference: test_string_type_preservation.py:15-109,
  * test_source_schema_types.py:15-89, migrator.py:345-507).
  */
class CastPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val compat = CompatConfig.default

  test("numeric-looking strings STAY strings (test_string_type_preservation.py)") {
    val df = Seq(("123", "456.7"), ("000042", "1e5")).toDF("code", "val")
    val out = CastPipeline(df,
      Seq(SourceColumn("code", "string"), SourceColumn("val", "string")), compat)
    assert(out.schema("code").dataType.typeName == "string")
    assert(out.schema("val").dataType.typeName == "string")
    assert(out.collect().map(_.getString(0)).toSet == Set("123", "000042"))
  }

  test("declared ints convert; malformed → null (T2, errors='coerce')") {
    val df = Seq("1", "2.0x", "33", "abc").toDF("n")
    val out = CastPipeline(df, Seq(SourceColumn("n", "bigint")), compat)
    assert(out.schema("n").dataType.typeName == "long")
    assert(out.collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(1L), None, Some(33L), None))
  }

  test("lenient boolean parse (T4, migrator.py:431-446)") {
    val df = Seq("true", "1", "YES", "y", "false", "0", "no", "N", "", "maybe")
      .toDF("b")
    val out = CastPipeline(df, Seq(SourceColumn("b", "boolean")), compat)
    val got = out.collect().map(r => Option(r.get(0)))
    assert(got.toSeq == Seq(Some(true), Some(true), Some(true), Some(true),
      Some(false), Some(false), Some(false), Some(false), Some(false), None))
  }

  test("null passthrough in boolean parse") {
    val df = Seq(Some("true"), None, Some("x")).toDF("b")
    val out = CastPipeline(df, Seq(SourceColumn("b", "boolean")), compat)
    assert(out.collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(true), None, None))
  }

  test("null tokens PRESERVED by default (§2.6, migrator.py:465-470)") {
    val df = Seq("nan", "None", "null", "<NA>", "real").toDF("s")
    val out = CastPipeline(df, Seq(SourceColumn("s", "string")), compat)
    assert(out.collect().map(_.getString(0)).toSeq ==
      Seq("nan", "None", "null", "<NA>", "real"))
  }

  test("null tokens stripped when preserve=false, case-insensitive") {
    val df = Seq("NAN", "none", "NULL", "<na>", "real").toDF("s")
    val out = CastPipeline(df, Seq(SourceColumn("s", "string")),
      compat.copy(preserveStringNullTokens = false))
    assert(out.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(None, None, None, None, Some("real")))
  }

  test("empty string → null is opt-in (T8, maxcompute_client.py:366-378)") {
    val df = Seq("", "  ", "x").toDF("s")
    val keep = CastPipeline(df, Seq(SourceColumn("s", "string")), compat)
    assert(keep.collect().map(r => Option(r.getString(0))).forall(_.isDefined))
    val strip = CastPipeline(df, Seq(SourceColumn("s", "string")),
      compat.copy(treatEmptyStringAsNull = true))
    assert(strip.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(None, None, Some("x")))
  }

  test("decimal cast keeps declared precision (T3)") {
    val df = Seq("12.345", "bad").toDF("d")
    val out = CastPipeline(df, Seq(SourceColumn("d", "decimal(10,2)")), compat)
    assert(out.schema("d").dataType.sql == "DECIMAL(10,2)")
    val got = out.collect()
    assert(got(0).getDecimal(0).toPlainString == "12.35")
    assert(got(1).get(0) == null)
  }

  test("temporal try_cast leniency (T6)") {
    val df = Seq("2024-01-02 03:04:05", "not a date").toDF("t")
    val out = CastPipeline(df, Seq(SourceColumn("t", "timestamp")), compat)
    val got = out.collect().map(r => Option(r.get(0)))
    assert(got(0).isDefined && got(1).isEmpty)
  }

  test("columns absent from catalog pass through untouched (T1)") {
    val df = Seq((1, "x")).toDF("a", "b")
    val out = CastPipeline(df, Seq(SourceColumn("a", "bigint")), compat)
    assert(out.schema("b").dataType.typeName == "string")
  }

  test("±inf → null cleanup on float columns only (T7)") {
    val df = Seq(1.0, Double.PositiveInfinity, Double.NegativeInfinity).toDF("f")
    val out = CastPipeline.basicCleanup(df)
    assert(out.collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(1.0), None, None))
  }

  test("cast diagnostics sample the offending values (T13)") {
    import graft.transform.CastDiagnostics
    val df = Seq("1", "nope", "3", "bad").toDF("n")
    val r = CastDiagnostics.sampleFailures(df, "n", "bigint")
    assert(r.failureCount == 2 && r.samples.toSet == Set("nope", "bad"))
    val all = CastDiagnostics.diagnose(df,
      Seq(SourceColumn("n", "bigint")))
    assert(all.size == 1 && all.head.column == "n")
    // clean column produces no report
    assert(CastDiagnostics.diagnose(Seq("1", "2").toDF("n"),
      Seq(SourceColumn("n", "bigint"))).isEmpty)
  }

  test("int-with-nulls stays 64-bit int — no float64 detour (vs pandas)") {
    val df = Seq(Some("1"), None, Some("3")).toDF("n")
    val out = CastPipeline(df, Seq(SourceColumn("n", "bigint")), compat)
    assert(out.schema("n").dataType.typeName == "long")
    assert(out.collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(1L), None, Some(3L)))
  }
}
