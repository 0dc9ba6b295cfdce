package graft

import graft.model._
import graft.transform.ConstraintEnforcer

/** Destination alignment + default fill + null policies
  * (reference: migrator.py:320-337, 509-679).
  */
class ConstraintEnforcerSpec extends SparkSpec {
  import spark.implicits._

  test("project to destination: subset + ordinal order, case-insensitive (P4)") {
    val df = Seq((1L, "x", 2.0)).toDF("a", "b", "c")
    val dest = Seq(DestColumn("C", "double"), DestColumn("A", "bigint"))
    val out = ConstraintEnforcer.projectToDestination(df, dest)
    assert(out.columns.toSeq == Seq("c", "a"))
  }

  test("db defaults fill non-nullable columns (D2)") {
    val df = Seq(Some(1L), None).toDF("n")
    val dest = Seq(DestColumn("n", "bigint", nullable = false, default = Some("42")))
    val out = ConstraintEnforcer.applyDbDefaults(df, dest)
    assert(out.as[Long].collect().toSeq == Seq(1L, 42L))
  }

  test("bit default literals: b'1', hex, decimal, garbage→0 (D2, migrator.py:548-566)") {
    import org.apache.spark.sql.functions.lit
    def eval(raw: String): Long = {
      val df = Seq(1).toDF("x")
      df.select(ConstraintEnforcer.coerceDefault(raw, "bit(1)").cast("long").as("v"))
        .as[Long].head()
    }
    assert(eval("b'1'") == 1L)
    assert(eval("b'101'") == 5L)
    assert(eval("0x0A") == 10L)
    assert(eval("7") == 7L)
    assert(eval("garbage") == 0L)
    lit(1) // keep import used
  }

  test("temporal default CURRENT_TIMESTAMP → now (D2, migrator.py:568-585)") {
    val df = Seq[Option[java.sql.Timestamp]](None).toDF("t")
    val dest = Seq(DestColumn("t", "datetime", nullable = false,
      default = Some("CURRENT_TIMESTAMP")))
    val out = ConstraintEnforcer.applyDbDefaults(df, dest)
    assert(out.collect()(0).get(0) != null)
  }

  test("fail policy: single-pass count, error enumerates col=count (D3)") {
    val df = Seq((Some(1L), Some("a")), (None, None), (None, Some("b")))
      .toDF("n", "s")
    val dest = Seq(DestColumn("n", "bigint", nullable = false),
      DestColumn("s", "varchar(255)", nullable = false))
    val e = intercept[DataMigrationError] {
      ConstraintEnforcer.enforceNullPolicy(df, dest, NullPolicy.Fail)
    }
    assert(e.getMessage.contains("n=2") && e.getMessage.contains("s=1"))
  }

  test("fill policy: sentinel for string-ish only; numeric passes through (D3)") {
    val dfS = Seq(Some("a"), None).toDF("s")
    val destS = Seq(DestColumn("s", "varchar(255)", nullable = false))
    val out = ConstraintEnforcer.enforceNullPolicy(dfS, destS, NullPolicy.Fill,
      sentinel = "??")
    assert(out.as[String].collect().toSeq == Seq("a", "??"))

    // numeric columns are not filled and do NOT raise under fill — the
    // reference's raise only triggers under policy='fail' (migrator.py:663)
    val dfN = Seq(Some(1L), None).toDF("n")
    val destN = Seq(DestColumn("n", "bigint", nullable = false))
    val outN = ConstraintEnforcer.enforceNullPolicy(dfN, destN, NullPolicy.Fill)
    assert(outN.as[Option[Long]].collect().toSeq == Seq(Some(1L), None))
  }

  test("fill policy: temporal column gets a type-aware epoch sentinel (D3)") {
    val dfT = Seq(Some(java.sql.Timestamp.valueOf("2024-05-01 10:00:00")), None)
      .toDF("t")
    val destT = Seq(DestColumn("t", "datetime", nullable = false))
    // default sentinel "" try_casts to NULL for timestamps — the epoch
    // fallback keeps the fill from being a silent no-op
    val outT = ConstraintEnforcer.enforceNullPolicy(dfT, destT, NullPolicy.Fill)
      .as[java.sql.Timestamp].collect().toSeq
    assert(outT(0) == java.sql.Timestamp.valueOf("2024-05-01 10:00:00"))
    assert(outT(1) == java.sql.Timestamp.valueOf("1970-01-01 00:00:00"))
  }

  test("skip policy drops offending rows (D3, migrator.py:666-674)") {
    val df = Seq((Some(1L), "a"), (None, "b")).toDF("n", "s")
    val dest = Seq(DestColumn("n", "bigint", nullable = false))
    val out = ConstraintEnforcer.enforceNullPolicy(df, dest, NullPolicy.Skip)
    assert(out.count() == 1)
  }

  test("nullable destination columns are untouched by any policy") {
    val df = Seq(Some(1L), None).toDF("n")
    val dest = Seq(DestColumn("n", "bigint", nullable = true))
    assert(ConstraintEnforcer.enforceNullPolicy(df, dest, NullPolicy.Fail)
      .count() == 2)
  }
}
