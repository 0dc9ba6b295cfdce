package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.MigrateFunctions
import graft.model.{CompatConfig, SourceColumn}
import graft.transform.CastPipeline

/** Property tests for the cast pipeline (SURVEY.md §5 test plan item 2):
  * totality (no input ever throws), type preservation, and semantic
  * models of the lenient parsers.
  */
class CastPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sampling (no scalatestplus bridge in the offline
    * cache): drive each property over `n` seeded samples.
    */
  private def forAllSamples[A](g: Gen[A], n: Int = 30)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private val messyString: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.numStr,
    Gen.oneOf("", " ", "null", "None", "<NA>", "NaN", "nan", "1.5", "-7",
      "true", "FALSE", "y", "N", "0", "1", "2024-01-01", "∞", "1e5", "0x10"),
    Gen.asciiPrintableStr.map(_.take(20)))

  test("property: casting any strings to any declared type never throws") {
    val types = Seq("bigint", "int", "double", "decimal(10,2)", "boolean",
      "string", "timestamp", "date", "binary")
    forAllSamples(Gen.zip(Gen.listOfN(12, messyString), Gen.oneOf(types))) {
      case (values: List[String], tpe: String) =>
        val df = values.toDF("c")
        val out = CastPipeline(df, Seq(SourceColumn("c", tpe)),
          CompatConfig.default)
        out.collect() // must not throw — errors='coerce' semantics
        assert(out.count() == values.size)
    }
  }

  test("property: string columns always preserve values exactly (default compat)") {
    forAllSamples(Gen.listOfN(10, messyString)) { (values: List[String]) =>
      val df = values.toDF("c")
      val out = CastPipeline(df, Seq(SourceColumn("c", "string")),
        CompatConfig.default)
      assert(out.as[String].collect().toList == values)
    }
  }

  test("property: lenient bool matches its reference model") {
    def model(s: String): Option[Boolean] = {
      val v = s.trim.toLowerCase
      if (Set("true", "1", "yes", "y").contains(v)) Some(true)
      else if (Set("false", "0", "no", "n", "").contains(v)) Some(false)
      else None
    }
    forAllSamples(Gen.listOfN(10, messyString)) { (values: List[String]) =>
      val got = values.toDF("c")
        .select(MigrateFunctions.lenientBool($"c"))
        .collect().map(r => Option(r.get(0)).map(_.asInstanceOf[Boolean]))
      assert(got.toList == values.map(model))
    }
  }

  test("property: long cast equals Scala parse for clean + garbage inputs") {
    forAllSamples(Gen.listOfN(10, messyString)) { (values: List[String]) =>
      val got = values.toDF("c")
        .select($"c".try_cast("long"))
        .collect().map(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
      values.zip(got).foreach { case (in, out) =>
        in.trim.toLongOption match {
          case Some(expected) => assert(out.contains(expected), s"input '$in'")
          case None           => () // spark may still parse ("1.5" → truncation rules)
        }
      }
    }
  }

  test("property: format template compilation never throws, output non-null") {
    val template = Gen.oneOf("{a}", "{a:02d}", "{a}-{b}", "plain", "{a:5s}",
      "{}{}", "{a:.2f}", "x{{literal}}y", "{missing}")
    forAllSamples(Gen.zip(template, Gen.listOfN(3, messyString))) {
      case (t: String, vals: List[String]) =>
        val df = Seq((vals.headOption.getOrElse(""), vals.lift(1).getOrElse("")))
          .toDF("a", "b")
        val out = df.select(MigrateFunctions.compileFormat(t, (name, pos) =>
          name match {
            case Some("a") | None if pos == 0 => Right(df("a"))
            case Some("b")                    => Right(df("b"))
            case Some(other)                  => Left(other)
            case None                         => Right(df("b"))
          }).as("f"))
        val r = out.collect()(0).getString(0)
        assert(r != null)
    }
  }
}
