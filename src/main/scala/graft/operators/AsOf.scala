package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the latest right row
  * with the same key and rightTime <= leftTime.
  *
  * Implementation is the union+window technique (compose-existing-ops —
  * preference (a) from the build guidance — rather than a custom
  * physical node): tag both sides, union, ONE shuffle by key + ONE sort
  * by (time, side), then `last(_, ignoreNulls)` over the running window
  * carries the most recent right payload forward into left rows.
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

  def join(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String]): DataFrame = {
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
