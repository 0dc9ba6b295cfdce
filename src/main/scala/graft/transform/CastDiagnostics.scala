package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.CompatConfig

/** Conversion-error analysis (SURVEY.md §2.3 T13;
  * reference: bigquery_client.py:196-225 sampled offending values on load
  * failure). Spark-first: the failing values are exactly the rows where
  * the declared cast nulls a non-null input — one filtered scan, no
  * failure required to diagnose.
  */
object CastDiagnostics {

  final case class CastFailureReport(column: String, declaredType: String,
      failureCount: Long, samples: Seq[String])

  /** Sample values that the declared type would coerce to NULL. */
  def sampleFailures(df: DataFrame, column: String, declaredType: String,
      maxSamples: Int = 10,
      compat: CompatConfig = CompatConfig.default): CastFailureReport = {
    val casted = CastPipeline.castColumn(col(column), declaredType, compat)
    val failing = df
      .filter(col(column).isNotNull && casted.isNull)
      .select(col(column).cast("string"))
    val count = failing.count()
    val samples =
      if (count == 0) Nil
      else failing.limit(maxSamples).collect().map(_.getString(0)).toSeq
    CastFailureReport(column, declaredType, count, samples)
  }

  /** Whole-schema diagnosis: one report per column that would lose data
    * under the declared source schema.
    */
  def diagnose(df: DataFrame, schema: Seq[graft.model.SourceColumn],
      compat: CompatConfig = CompatConfig.default): Seq[CastFailureReport] =
    schema.filter(c => df.columns.exists(_.equalsIgnoreCase(c.name)))
      .map(c => sampleFailures(df, c.name, c.typeName, compat = compat))
      .filter(_.failureCount > 0)
}
