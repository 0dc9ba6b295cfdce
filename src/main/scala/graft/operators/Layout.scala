package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: cluster rows so file-level min/max statistics
  * prune scans on MULTIPLE columns at once.
  *
  * A single-column sort gives perfect pruning on that column and none
  * on any other; Z-ORDER (Morton) interleaving maps each row to a point
  * on a space-filling curve, so a contiguous z-range is a compact
  * multi-dimensional tile — every laid-out file then has narrow min/max
  * on EVERY participating column. At 100 TB this is the difference
  * between reading one file and reading the whole table for a
  * two-predicate point query; the same technique backs every public
  * lakehouse OPTIMIZE ZORDER implementation.
  *
  * The z-value is computed with builtin bitwise ops (the classic
  * "Binary Magic Numbers" bit-spreading, public domain) — pure Column
  * arithmetic, fully inside whole-stage codegen, no custom kernel and
  * no UDF — and the layout is `repartitionByRange(z)` + an
  * in-partition sort: one range shuffle, each output file a z-tile.
  */
object Layout {

  /** Spread the low 16 bits of a (non-negative) value so bit i lands at
    * bit 2i: 0b1111 → 0b01010101.
    */
  def spread16(x: Column): Column = {
    val a = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    val b = (a.bitwiseOR(shiftleft(a, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val c = (b.bitwiseOR(shiftleft(b, 2))).bitwiseAND(lit(0x33333333L))
    (c.bitwiseOR(shiftleft(c, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Morton z-value interleaving the low 16 bits of two columns. */
  def zValue2(x: Column, y: Column): Column =
    spread16(x.cast("long").bitwiseAND(lit(0xFFFFL)))
      .bitwiseOR(shiftleft(spread16(y.cast("long").bitwiseAND(lit(0xFFFFL))), 1))

  /** Lay out `df` clustered by the z-order of (xCol, yCol): one range
    * shuffle on z + in-partition sort, so each of `partitions` output
    * splits covers a compact 2-D tile of the (x, y) space. Write the
    * result with any file sink and both columns prune at scan time.
    */
  def zorderBy(df: DataFrame, xCol: String, yCol: String,
      partitions: Int): DataFrame =
    df.withColumn("__z", zValue2(col(xCol), col(yCol)))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
}
