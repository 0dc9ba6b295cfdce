package graft

import graft.model._
import graft.transform.MappingTransform

/** Mapping layer semantics (reference: migrator.py:827-977, 752-825;
  * README.md:224-321).
  */
class MappingTransformSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq((1L, "alice", "NY", 2024, 7))
    .toDF("id", "name", "city", "year", "week")

  test("include keeps listed columns, case-insensitive (P3)") {
    val out = MappingTransform(df, MappingPlan(include = Some(Seq("ID", "Name"))))
    assert(out.columns.toSeq == Seq("id", "name"))
  }

  test("exclude drops listed columns (P3)") {
    val out = MappingTransform(df, MappingPlan(exclude = Seq("CITY", "week")))
    assert(out.columns.toSeq == Seq("id", "name", "year"))
  }

  test("rename is case-insensitive on source (P5)") {
    val out = MappingTransform(df, MappingPlan(rename = Map("NAME" -> "full_name")))
    assert(out.columns.contains("full_name") && !out.columns.contains("name"))
  }

  test("computed concat: columns + literals, null → '' (§2.4)") {
    val d = Seq((Some("a"), "b"), (None, "c")).toDF("x", "y")
    val out = MappingTransform(d, MappingPlan(computed =
      Seq(ComputedColumn("z", "concat", Seq("x", "-", "y")))))
    assert(out.select("z").as[String].collect().toSeq == Seq("a-b", "-c"))
  }

  test("computed upper/lower/substr (0-based like python slicing)") {
    val d = Seq("Hello").toDF("s")
    val plan = MappingPlan(computed = Seq(
      ComputedColumn("u", "upper", Seq("s")),
      ComputedColumn("l", "lower", Seq("s")),
      ComputedColumn("sub", "substr", Seq("s", "1", "3")),
      ComputedColumn("tail", "substr", Seq("s", "2"))))
    val r = MappingTransform(d, plan).select("u", "l", "sub", "tail")
      .as[(String, String, String, String)].head()
    assert(r == (("HELLO", "hello", "ell", "llo")))
  }

  test("later computed columns can reference earlier ones") {
    val d = Seq("x").toDF("s")
    val plan = MappingPlan(computed = Seq(
      ComputedColumn("a", "upper", Seq("s")),
      ComputedColumn("b", "concat", Seq("a", "!"))))
    assert(MappingTransform(d, plan).select("b").as[String].head() == "X!")
  }

  test("format: named template with zero-padding (README.md:224-263)") {
    val d = Seq((2024, 7), (2024, 11)).toDF("year", "week")
    val plan = MappingPlan(computed =
      Seq(ComputedColumn("yw", "format", Seq("{year}-{week:02d}"))))
    assert(MappingTransform(d, plan).select("yw").as[String].collect().toSeq ==
      Seq("2024-07", "2024-11"))
  }

  test("format: numeric spec coerces null to 0; string spec null to ''") {
    val d = Seq((Some(5), Some("x")), (None, None)).toDF("n", "s")
    val plan = MappingPlan(computed =
      Seq(ComputedColumn("f", "format", Seq("{n:03d}|{s}"))))
    assert(MappingTransform(d, plan).select("f").as[String].collect().toSeq ==
      Seq("005|x", "000|"))
  }

  test("format: positional args mix columns and literals") {
    val d = Seq(("a", 2)).toDF("c1", "c2")
    val plan = MappingPlan(computed =
      Seq(ComputedColumn("f", "format", Seq("{}-{:02d}", "c1", "c2"))))
    assert(MappingTransform(d, plan).select("f").as[String].head() == "a-02")
  }

  test("defaults fill nulls with typed literal (D1)") {
    val d = Seq((Some(1L), Some("x")), (None, None)).toDF("n", "s")
    val plan = MappingPlan(defaults = Map("n" -> "99", "s" -> "unk"))
    val got = MappingTransform(d, plan).as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "x"), (99L, "unk")))
  }

  test("order lists first, missing ignored, rest appended (P6)") {
    val out = MappingTransform(df,
      MappingPlan(order = Seq("week", "ghost", "name")))
    assert(out.columns.toSeq == Seq("week", "name", "id", "city", "year"))
  }

  test("validation: include column must exist (D5)") {
    assertThrows[MappingValidationError] {
      MappingTransform.validate(MappingPlan(include = Some(Seq("nope"))),
        Seq("id", "name"))
    }
  }

  test("validation: rename source must exist, targets unique (D5)") {
    assertThrows[MappingValidationError] {
      MappingTransform.validate(MappingPlan(rename = Map("ghost" -> "x")),
        Seq("id"))
    }
    assertThrows[MappingValidationError] {
      MappingTransform.validate(
        MappingPlan(rename = Map("a" -> "x", "b" -> "X")), Seq("a", "b"))
    }
  }

  test("validation: computed functions whitelisted (D5, migrator.py:784-788)") {
    assertThrows[MappingValidationError] {
      MappingTransform.validate(MappingPlan(computed =
        Seq(ComputedColumn("z", "eval", Seq("x")))), Seq("x"))
    }
  }

  test("validation: named format placeholders must resolve (D5)") {
    assertThrows[MappingValidationError] {
      MappingTransform.validate(MappingPlan(computed =
        Seq(ComputedColumn("z", "format", Seq("{ghost:02d}")))), Seq("x"))
    }
    // resolves against renamed + earlier computed names
    MappingTransform.validate(MappingPlan(
      rename = Map("x" -> "year"),
      computed = Seq(ComputedColumn("z", "format", Seq("{year:02d}")))),
      Seq("x"))
  }
}
