package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketch

/** Mergeable-sketch operators: HLL merge equality + error bounds, GK
  * quantile exactness at full accuracy, CMS frequency bounds.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders = Tables(spark, sf001, "orders")

  test("HLL: union of partial sketches == direct sketch; error bound vs exact") {
    val direct = Sketch.hllDistinct(
        orders.withColumn("g", lit(1)), "g", "o_custkey")
      .head().getLong(1)
    val rolled = Sketch.hllRollup(
        Sketch.hllSketches(
          orders.withColumn("m", month($"o_orderdate")), "m", "o_custkey"))
      .head().getLong(0)
    // merging per-month sketches must reproduce the direct estimate
    assert(rolled == direct)

    val exact = orders.select(count_distinct($"o_custkey")).head().getLong(0)
    assert(math.abs(rolled - exact).toDouble / exact < 0.02,
      s"HLL estimate $rolled vs exact $exact")
  }

  test("HLL per-group: coupon-mode cardinalities are exact") {
    val got = Sketch.hllDistinct(orders, "o_orderpriority", "o_custkey")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = orders.groupBy($"o_orderpriority")
      .agg(count_distinct($"o_custkey"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // sf0.001 cardinalities (~150/group) sit far below the lgK=14
    // coupon capacity, where DataSketches is exact by construction
    assert(got == exact)
  }

  test("portable HLL: per-month rollup == direct global build; error < 2%") {
    // merge associativity: rolling up per-month register tables must
    // produce byte-identical output to registers built with one group
    val rolled = Sketch.portableRollup(
      Sketch.portableRegisters(
        orders.withColumn("m", month($"o_orderdate")), "m", "o_custkey"))
    val direct = Sketch.portableRollup(
      Sketch.portableRegisters(
        orders.withColumn("g", lit(1)), "g", "o_custkey"))
    assert(rolled.collect().toSeq == direct.collect().toSeq)

    val est = rolled.head().getLong(0)
    val exact = orders.select(count_distinct($"o_custkey")).head().getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.02,
      s"portable HLL estimate $est vs exact $exact")
  }

  test("portable HLL per-group: estimates within 5% of exact") {
    val got = Sketch.portableDistinct(orders, "o_orderpriority", "o_custkey")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = orders.groupBy($"o_orderpriority")
      .agg(count_distinct($"o_custkey"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == exact.keySet && got.nonEmpty)
    exact.foreach { case (k, t) =>
      assert(math.abs(got(k) - t).toDouble / t < 0.05,
        s"group $k: portable HLL ${got(k)} vs exact $t")
    }
  }

  test("portable HLL: NULL values don't count; empty input estimates 0") {
    val df = Seq((1, Some("a")), (1, Some("b")), (1, None), (1, Some("a")))
      .toDF("g", "v")
    val est = Sketch.portableRollup(Sketch.portableRegisters(df, "g", "v"))
      .head().getLong(0)
    assert(est == 2L, s"NULL must be excluded: got $est")

    val empty = Sketch.portableRollup(
      Sketch.portableRegisters(df.filter($"v".isNull), "g", "v"))
    val row = empty.head()
    // all-empty-register state: estimate 0 via linear counting, V = m
    assert(row.getLong(0) == 0L && row.getLong(2) == 4096L, row.toString)
  }

  test("GK quantiles at full accuracy == exact rank-ceil(p*n) selection") {
    val got = Sketch.quantiles(orders, "o_orderpriority", "o_totalprice",
        Seq(0.25, 0.5, 0.75))
      .select($"o_orderpriority", element_at($"qs", 2).as("q50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // ground truth: the element at rank ceil(0.5 * n) under a total sort
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_orderpriority").orderBy($"o_totalprice".asc)
    val truth = orders
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"o_orderpriority")))
      .filter($"rk" === ceil($"n" * 0.5))
      .select($"o_orderpriority", $"o_totalprice")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == truth && got.nonEmpty)
  }

  test("Profile.topValues: frequency order, all-tied values rank by value ASC") {
    val df = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("c", "x"))
      .toDF("c1", "c2")
    val got = graft.operators.Profile.topValues(df, Seq("c1", "c2"), k = 2)
      .collect()
      .map(r => (r.getString(0), r.getInt(3)) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(got(("c1", 1)) == (("a", 2L)))  // most frequent first
    assert(got(("c1", 2)) == (("b", 1L)))  // tie b/c -> value ASC
    assert(got(("c2", 1)) == (("x", 3L)))
    assert(got(("c2", 2)) == (("y", 1L)))
  }

  test("topValues plan: ONE table scan regardless of profiled column count") {
    val plan = graft.operators.Profile.topValues(
      orders, Seq("o_orderstatus", "o_orderpriority"), k = 3)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 scan, got $scans")
  }

  test("CMS: estimates overcount only, within eps*N") {
    val n = orders.count()
    val truth = orders.groupBy($"o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Sketch.cmsFrequencies(orders, "o_orderpriority",
        truth.keys.toSeq.sorted, eps = 0.001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, t) =>
      assert(est(k) >= t, s"CMS undercounted $k: ${est(k)} < $t")
      assert(est(k) <= t + (0.001 * n).toLong + 1,
        s"CMS overcount beyond bound for $k: ${est(k)} vs $t")
    }
  }
}
