package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Binned range join == the naive BETWEEN join (which Spark plans as a
  * nested loop), including the long-interval fallback leg.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned range join == naive BETWEEN join (numeric axis)") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 500).map(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, s"p$i")).toDF("k", "t", "tag")
    val right = (1 to 120).map { i =>
      val s = rnd.nextInt(950).toLong
      // mixed widths, incl. some longer than maxBins*binWidth to force
      // the broadcast fallback leg
      val len = if (i % 17 == 0) 900L else rnd.nextInt(40).toLong
      (rnd.nextInt(10).toLong, s, s + len, i.toLong)
    }.toDF("k", "s", "e", "ival_id")

    val binned = RangeJoin.join(left, right, "k", "t", "s", "e",
        binWidth = 10L, maxBinsPerInterval = 8)
      .select("k", "t", "tag", "s", "e", "ival_id")
      .collect().map(_.toSeq).toSet
    val plain = left.join(right,
        left("k") === right("k") && $"t" >= $"s" && $"t" <= $"e")
      .drop(right("k"))
      .select("k", "t", "tag", "s", "e", "ival_id")
      .collect().map(_.toSeq).toSet
    assert(binned == plain && plain.nonEmpty)
    // both legs exercised
    assert(right.filter(($"e" - $"s") / 10 + 1 > 8).count() > 0)
  }

  test("inverted and NULL-bounded intervals: no matches, no bin explosion") {
    val left = Seq((1L, 100L, "p")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, Some(90L), Some(110L), 1L),   // valid: matches
      (1L, Some(5000000L), Some(0L), 2L),// inverted: 500k-bin span if naively expanded
      (1L, None, Some(110L), 3L),        // NULL start
      (1L, Some(90L), None, 4L)          // NULL end
    ).toDF("k", "s", "e", "ival_id")
    val got = RangeJoin.join(left, right, "k", "t", "s", "e",
      binWidth = 10L, maxBinsPerInterval = 8)
    // only the valid interval matches — and this returns promptly
    // because the inverted row never reaches the descending-sequence
    // explode (the naive BETWEEN join agrees: NULL/inverted never match)
    assert(got.select("ival_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("timestamp axis: follow-up orders in 7-day windows == naive join") {
    val orders = Tables(spark, sf001, "orders")
    val pts = orders.select($"o_orderkey".as("p_orderkey"),
      $"o_custkey".as("user_id"), $"o_orderdate".cast("timestamp").as("t"))
    val iv = orders.select($"o_orderkey", $"o_custkey".as("user_id"),
      $"o_orderdate".cast("timestamp").as("win_start"),
      ($"o_orderdate".cast("timestamp") + expr("INTERVAL 7 DAYS")).as("win_end"))
    val got = RangeJoin.join(pts, iv, "user_id", "t", "win_start", "win_end",
        binWidth = 7L * 24 * 3600)
      .filter($"p_orderkey" =!= $"o_orderkey")
      .groupBy($"o_orderkey").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    val want = pts.join(iv,
        pts("user_id") === iv("user_id") &&
          $"t" >= $"win_start" && $"t" <= $"win_end")
      .filter($"p_orderkey" =!= $"o_orderkey")
      .groupBy($"o_orderkey").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want && got.nonEmpty)
  }
}
