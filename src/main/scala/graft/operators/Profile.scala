package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table profiling for migration QA — the data-quality counterpart of
  * dry-run's schema report (reference's dry-run validated schema only;
  * profiling validates the DATA before/after a move).
  *
  * One aggregate pass computes every column's stats simultaneously
  * (null count, distinct, min/max for orderable types) — a single
  * partial+final agg job regardless of column count; at 100 TB the
  * exact-distinct shuffles per column can be switched to HLL sketches
  * (`approxDistinct = true` → approx_count_distinct, fixed-size state).
  */
object Profile {

  /** Long-format profile: one output row per column. */
  def summarize(df: DataFrame, approxDistinct: Boolean = false): DataFrame = {
    val aggs: Seq[Column] = df.schema.fields.flatMap { f =>
      val c = col(f.name)
      val distinct =
        if (approxDistinct) approx_count_distinct(c)
        else count_distinct(c)
      val orderable = f.dataType match {
        case _: ArrayType | _: MapType | _: StructType | BinaryType => false
        case _ => true
      }
      val minC = if (orderable) min(c).cast("string") else lit(null).cast("string")
      val maxC = if (orderable) max(c).cast("string") else lit(null).cast("string")
      Seq(
        count(when(c.isNull, lit(1))).as(s"${f.name}__nulls"),
        distinct.as(s"${f.name}__distinct"),
        minC.as(s"${f.name}__min"),
        maxC.as(s"${f.name}__max"))
    }.toIndexedSeq
    val row = df.agg(count(lit(1)).as("__rows"), aggs: _*)

    // pivot the single wide row into (column, stats) rows
    val spark = df.sparkSession
    import spark.implicits._
    val r = row.head()
    val total = r.getAs[Long]("__rows")
    df.schema.fields.map { f =>
      (f.name, f.dataType.catalogString, total,
        r.getAs[Long](s"${f.name}__nulls"),
        r.getAs[Long](s"${f.name}__distinct"),
        Option(r.getAs[String](s"${f.name}__min")),
        Option(r.getAs[String](s"${f.name}__max")))
    }.toSeq.toDF("column", "type", "n_rows", "n_nulls", "n_distinct",
      "min_value", "max_value")
  }

  /** Most-frequent values per column — the profiler's "top categories"
    * view. One count aggregate per column (unioned — column count is
    * small and static), then the bounded-heap top-k per column
    * ((n DESC, value ASC), the TopKByScore tiebreak), so no per-column
    * sort and no single task ranks a high-cardinality column's whole
    * value set.
    *
    * Output: (col_name, value, n, rank 1..k) — value stringified.
    */
  def topValues(df: DataFrame, columns: Seq[String], k: Int): DataFrame = {
    require(columns.nonEmpty, "topValues: need at least one column")
    // ONE scan: unpivot via explode(array(struct...)) — a per-column
    // union would rescan the table once per profiled column (Spark
    // does not CSE across union branches)
    val counted = df
      .select(explode(array(columns.map { c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("value"))
      }: _*)).as("e"))
      .select(col("e.col_name").as("col_name"), col("e.value").as("value"))
      .filter(col("value").isNotNull)
      .groupBy(col("col_name"), col("value"))
      .agg(count(lit(1)).as("n"))
    counted
      .groupBy(col("col_name"))
      .agg(graft.functions.TopKAgg.topKByScore(
        col("n").cast("double"), col("value"), k).as("topk"))
      .select(col("col_name"), explode(col("topk")).as("e"))
      .select(col("col_name"), col("e.id").as("value"),
        col("e.score").cast("long").as("n"), col("e.rank").as("rank"))
  }

  /** Fixed-width histogram of a numeric column: (bin, lo, n) with
    * bin = floor(value / width). One aggregate pass; IEEE division is
    * correctly rounded in any engine, so bin edges are portable.
    * NULLs are excluded (they're a profile stat, not a bin).
    */
  def histogram(df: DataFrame, column: String, width: Double): DataFrame = {
    require(width > 0, s"width must be positive: $width")
    df.filter(col(column).isNotNull)
      .select(floor(col(column).cast("double") / lit(width))
        .cast("long").as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"), (col("bin").cast("double") * lit(width)).as("lo"),
        col("n"))
  }
}
