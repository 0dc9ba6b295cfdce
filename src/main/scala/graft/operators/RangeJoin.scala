package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Range (interval) join: left rows with a point column match right rows
  * whose [start, end] interval contains the point (inclusive), on an
  * optional equi-key.
  *
  * Spark's own planner turns `l.t BETWEEN r.start AND r.end` into a
  * broadcast-nested-loop or cartesian product — per-key it is quadratic,
  * and at 100 TB it is the canonical accidentally-O(n²) query. The
  * standard distributed fix (used by every warehouse range-join
  * implementation in the public literature) is BINNING: quantize the
  * time axis into fixed-width bins, expand each interval to the bins it
  * overlaps, tag each point with its single bin, equi-join on
  * (key, bin), then verify the exact containment predicate. Each
  * interval expands to O(len/binWidth + 1) rows — pick `binWidth` near
  * the typical interval length and the join is linear with a small
  * constant expansion instead of quadratic.
  *
  * Scale shape: ONE equi-shuffle on (key, bin) per side (the same cost
  * class as any join), verification inside codegen; a pathological
  * giant interval is bounded by `maxBinsPerInterval` — longer intervals
  * take a separate exact broadcast leg (rare by construction when
  * binWidth is near the median interval length), unioned in, so the
  * result stays exact.
  */
object RangeJoin {

  /** Join `left` (point `tCol`) with `right` (interval
    * [`startCol`, `endCol`]) on inclusive containment plus an equi-`key`.
    * `binWidth` is in the point column's units (seconds for timestamps).
    *
    * Output: all left columns + right's interval/payload columns
    * (right's key column dropped).
    */
  def join(left: DataFrame, right: DataFrame, key: String,
      tCol: String, startCol: String, endCol: String,
      binWidth: Long, maxBinsPerInterval: Int = 64): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")

    def asLong(df: DataFrame, name: String): Column =
      df.schema(name).dataType match {
        // cast first: unix_timestamp (like unix_micros) rejects NTZ
        // input; the cast is a no-op on an already-instant column
        case TimestampType | TimestampNTZType =>
          unix_timestamp(col(name).cast(TimestampType))
        case _                                => col(name).cast("long")
      }
    def bin(df: DataFrame, name: String): Column =
      floor(asLong(df, name) / binWidth).cast("long")

    val nBins = (bin(right, endCol) - bin(right, startCol) + 1).cast("int")
    val contains = col(tCol) >= col(startCol) && col(tCol) <= col(endCol)

    // nBins >= 1 guards INVERTED intervals (end < start): they can never
    // contain a point, but a negative span would slip past the <= max
    // filter and sequence(hi, lo) generates DESCENDING bins — one
    // garbage row with wildly swapped bounds would explode into
    // |span|/binWidth rows. NULL-bounded intervals drop from both legs
    // the same way (NULL comparisons are never true), matching the
    // naive BETWEEN join's no-match semantics.
    val shortIvals = right
      .filter(nBins >= 1 && nBins <= maxBinsPerInterval)
      .withColumn("__bin",
        explode(sequence(bin(right, startCol), bin(right, endCol))))
    val taggedLeft = left.withColumn("__bin", bin(left, tCol))

    val binned = taggedLeft.join(shortIvals,
        taggedLeft(key) === shortIvals(key) &&
          taggedLeft("__bin") === shortIvals("__bin") && contains)
      .drop(shortIvals(key)).drop("__bin")

    // rare giant intervals: exact fallback leg, broadcasting the (small)
    // long-interval side
    val longIvals = right.filter(nBins > maxBinsPerInterval)
    val fallback = left.join(broadcast(longIvals),
        left(key) === longIvals(key) && contains)
      .drop(longIvals(key))

    binned.unionByName(fallback)
  }
}
