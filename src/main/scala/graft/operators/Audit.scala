package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Curation lineage accounting — the first thing a production pipeline
  * owner asks of a multi-stage curation job is "which stage dropped
  * how much of which source", and none of the capstone compositions
  * (curate / hygiene / recipe / curriculum) answer it without a
  * per-stage re-run. This operator turns the stage predicates those
  * jobs already compute into a per-(stage, group) audit frame in ONE
  * aggregate pass.
  */
object Audit {

  /** Per-stage audit over a corpus whose stage outcomes are boolean
    * columns: `stages` is the ordered list of (name, keepPredicate),
    * each predicate evaluated on the rows that SURVIVED all earlier
    * stages (rows already dropped never re-enter — their later flags
    * are ignored, so flag columns built from stage drop/keep lists may
    * be null/false there without skewing the counts).
    *
    * Output: one row per (stage_idx, stage, group) with
    * `in_docs` (rows entering the stage), `kept_docs`/`dropped_docs`,
    * and `kept_mass`/`dropped_mass` (the `mass` column, BIGINT-cast,
    * split the same way). The group column keeps its name.
    *
    * Scale shape: one narrow generator (×|stages| rows — stage counts
    * are single digits) into one hash aggregate whose output is
    * bounded by |stages| × |groups|, never the corpus; the stage
    * predicates ride the same scan the curation job already pays for.
    */
  def curationAudit(df: DataFrame, groupCol: String, mass: Column,
      stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "curationAudit needs at least one stage")
    var entering: Column = lit(true)
    val rows = stages.zipWithIndex.map { case ((name, keep), i) =>
      val in = entering
      val kept = entering && keep
      entering = kept
      struct(lit(i.toLong).as("stage_idx"), lit(name).as("stage"),
        in.as("in"), kept.as("kept"))
    }
    df.select(col(groupCol), mass.cast("long").as("__mass"),
        explode(array(rows: _*)).as("__st"))
      .filter(col("__st.in"))
      .groupBy(col("__st.stage_idx").as("stage_idx"),
        col("__st.stage").as("stage"), col(groupCol))
      .agg(count(lit(1)).as("in_docs"),
        sum(when(col("__st.kept"), 1L).otherwise(0L)).as("kept_docs"),
        sum(when(!col("__st.kept"), 1L).otherwise(0L)).as("dropped_docs"),
        sum(when(col("__st.kept"), col("__mass")).otherwise(0L))
          .as("kept_mass"),
        sum(when(!col("__st.kept"), col("__mass")).otherwise(0L))
          .as("dropped_mass"))
  }
}
