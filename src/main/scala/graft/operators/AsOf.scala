package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the latest right row
  * with the same key and rightTime <= leftTime.
  *
  * Two implementations with identical semantics (AsOfSpec asserts
  * equivalence):
  *
  *  - [[join]] — the default — plans the custom Catalyst operator
  *    ([[graft.plans.AsOfJoinPlan]] → `GraftStrategy` →
  *    [[graft.plans.AsOfJoinExec]]): both sides co-partitioned by key
  *    and sorted by (key, time), then a streaming per-partition merge
  *    holding one buffered right row — no union, no window buffer.
  *  - [[joinViaWindow]] — compose-existing-ops fallback: tag both
  *    sides, union, ONE shuffle by key + ONE sort by (time, side), then
  *    `last(_, ignoreNulls)` over the running window carries the most
  *    recent right payload forward into left rows.
  *
  * Scale: exactly one Exchange (hash by key) and one in-partition sort —
  * the same cost as a sort-merge join, with no range-explosion. Compare
  * the naive formulation (left ⋈ right on key AND rightTime <= leftTime,
  * then max per left row): that join is a partial cross product per key
  * — quadratic in rows-per-key at 100 TB. Right-side ties on (key, time)
  * should be pre-deduped by the caller for deterministic output.
  *
  * The payload travels as ONE struct column with a single
  * `last(_, ignoreNulls)`: carrying each payload column independently
  * would let a NULL field on the matching right row be replaced by a
  * stale value from an older row — and different fields could even come
  * from different right rows. The struct is non-null per right row, so
  * all fields are taken from the SAME (latest) right row, nulls intact.
  */
object AsOf {

  /** Native path: builds the custom logical node and lets the planner
    * strategy produce the merge exec. The right side is pruned to
    * (key, time, payload) BEFORE entering the operator — Catalyst can't
    * column-prune through a foreign node — and re-aliased so a self-join
    * can't alias-collide.
    */
  def join(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    import org.apache.spark.sql.graftshim.ExprBridge

    val spark = left.sparkSession
    ensureStrategy(spark)

    val rightPruned = right.select(
      (Seq(key, rightTime) ++ rightPayload).distinct.map(col).toIndexedSeq: _*)
    val lPlan = left.queryExecution.analyzed
    // fresh exprIds on the right so left==right (self as-of) stays sound
    val rBase = rightPruned.queryExecution.analyzed
    val rPlan = org.apache.spark.sql.catalyst.plans.logical.Project(
      rBase.output.map(a => Alias(a, a.name)()), rBase)

    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      plan.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))

    val payload = rightPayload.map(c => attr(rPlan, c))
    val payloadOut = payload.zip(rightPayload).map { case (a, c) =>
      AttributeReference(s"asof_$c", a.dataType, nullable = true)()
    }
    ExprBridge.ofRows(spark, graft.plans.AsOfJoinPlan(
      lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, key),
      attr(lPlan, leftTime), attr(rPlan, rightTime),
      payload, payloadOut))
  }

  /** Make the planner aware of [[graft.plans.AsOfJoinPlan]] even when the
    * session wasn't built with `spark.sql.extensions=graft.GraftExtensions`.
    */
  private def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(graft.plans.GraftStrategy))
      spark.experimental.extraStrategies = cur :+ graft.plans.GraftStrategy
  }

  def joinViaWindow(left: DataFrame, right0: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String]): DataFrame = {
    // equi-join semantics: a NULL key or NULL time can never match — and
    // the window formulation would otherwise group null keys together
    // (partitionBy treats nulls as equal) and sort null times first
    // (visible to every left row)
    val right = right0.filter(col(key).isNotNull && col(rightTime).isNotNull)
    val leftCols = left.columns.toSeq
    val payloadType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(right.schema.fieldIndex(c))))

    val taggedLeft = left.withColumn("__side", lit(1))
      .withColumn("__t", col(leftTime))
      .withColumn("__r", lit(null).cast(payloadType))
    // build the payload struct straight off the right row (the payload may
    // BE the time column), then null-pad the left-side columns
    val taggedRight = leftCols.filterNot(_ == key)
      .foldLeft(right.select(
        col(key), col(rightTime).as("__t"),
        struct(rightPayload.map(col).toIndexedSeq: _*).as("__r"))
        .withColumn("__side", lit(0))) {
        (d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }

    val shape = (leftCols ++ Seq("__side", "__t", "__r")).map(col).toIndexedSeq
    val unioned = taggedLeft.select(shape: _*)
      .unionByName(taggedRight.select(shape: _*))

    // right rows at the same instant sort BEFORE left rows → inclusive <=
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__asof",
      last(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightPayload.map(c => col(s"__asof.$c").as(s"asof_$c"))).toIndexedSeq: _*)
  }
}
