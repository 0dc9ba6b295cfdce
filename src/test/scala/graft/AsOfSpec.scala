package graft

import java.sql.Timestamp

import graft.operators.AsOf

/** As-of join semantics on constructed data with known answers. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def checkBothPaths(
      left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame,
      key: String, lt: String, rt: String, payload: Seq[String]): Unit = {
    val native = AsOf.join(left, right, key, lt, rt, payload)
    val window = AsOf.joinViaWindow(left, right, key, lt, rt, payload)
    assert(native.collect().map(_.toSeq).toSet ==
      window.collect().map(_.toSeq).toSet)
  }

  test("as-of picks the latest right row at-or-before left time, per key") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"),
      (1L, ts("2024-01-01 12:00:00"), "e2"),
      (2L, ts("2024-01-01 09:00:00"), "e3"),
      (3L, ts("2024-01-01 09:00:00"), "e4")) // key with no right rows
      .toDF("k", "t", "name")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 200.0),
      (2L, ts("2024-01-01 09:00:00"), 300.0), // exactly equal time → matches
      (2L, ts("2024-01-01 23:00:00"), 400.0)) // future → never matches e3
      .toDF("k", "rt", "price")

    val out = AsOf.join(left, right, "k", "t", "rt", Seq("price"))
      .select($"name", $"asof_price").as[(String, Option[Double])]
      .collect().toMap
    assert(out("e1") == Some(100.0)) // latest <= 10:00 is 09:30
    assert(out("e2") == Some(200.0)) // 11:00 beats 09:30
    assert(out("e3") == Some(300.0)) // inclusive <=
    assert(out("e4") == None)        // no right rows for key 3
    checkBothPaths(left, right, "k", "t", "rt", Seq("price"))
  }

  test("native plan: AsOfJoinExec, no Union, both sides clustered by key") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "e1")).toDF("k", "t", "name")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "rt", "price")
    val plan = AsOf.join(left, right, "k", "t", "rt", Seq("price"))
      .queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("AsOfJoin")) // SparkPlan nodeName strips "Exec"
    assert(s.contains("Exchange hashpartitioning"))
    assert(!s.contains("Union"))
    assert(!s.contains("Window"))
  }

  test("NULL payload on the matching right row stays NULL (single-struct carry)") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "e1"))
      .toDF("k", "t", "name")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), Some(100.0), Some("old")),
      // the matching (latest) row has a NULL price — it must NOT be
      // backfilled from the older row, and qty/price must both come from
      // THIS row, not be mixed across rows
      (1L, ts("2024-01-01 11:00:00"), None, Some("new")))
      .toDF("k", "rt", "price", "tag")

    val out = AsOf.join(left, right, "k", "t", "rt", Seq("price", "tag"))
      .select($"asof_price", $"asof_tag")
      .as[(Option[Double], Option[String])].head()
    assert(out == ((None, Some("new"))))
    checkBothPaths(left, right, "k", "t", "rt", Seq("price", "tag"))
  }

  test("native == window on randomized data with null keys/times and ties") {
    val rnd = new scala.util.Random(42)
    def t(min: Int): Timestamp = ts(f"2024-01-01 ${8 + min / 60}%02d:${min % 60}%02d:00")
    val left = (1 to 400).map { i =>
      (if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(12).toLong),
        if (rnd.nextInt(20) == 0) None else Some(t(rnd.nextInt(600))),
        s"L$i")
    }.toDF("k", "lt", "name")
    val right = (1 to 300).map { i =>
      (if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(12).toLong),
        if (rnd.nextInt(20) == 0) None else Some(t(rnd.nextInt(600))),
        if (rnd.nextInt(10) == 0) None else Some(i.toDouble))
    }.toDF("k", "rt", "v")
      // ties on (k, rt) make last-row-wins ambiguous across impls —
      // dedupe like the operator contract requires of callers
      .groupBy("k", "rt").agg(org.apache.spark.sql.functions.max("v").as("v"))

    checkBothPaths(left, right, "k", "lt", "rt", Seq("v"))
  }

  test("as-of matches the correlated-subquery oracle on real tables") {
    val ev = Tables(spark, sf001, "events")
      .select($"event_id", $"user_id", $"ts").limit(500)
    val ord = Tables(spark, sf001, "orders")
      .groupBy($"o_custkey".as("user_id"), $"o_orderdate")
      .agg(org.apache.spark.sql.functions.max($"o_orderkey").as("o_orderkey"))
    val asof = AsOf.join(ev, ord, "user_id", "ts", "o_orderdate",
        Seq("o_orderdate"))
      .select($"event_id", $"asof_o_orderdate")
      .as[(Long, Option[Timestamp])].collect().toMap

    ev.createOrReplaceTempView("ev_v")
    Tables(spark, sf001, "orders").createOrReplaceTempView("ord_v")
    val ref = spark.sql(
      """SELECT event_id,
        |  (SELECT max(o_orderdate) FROM ord_v
        |   WHERE o_custkey = user_id AND o_orderdate <= ts) AS d
        |FROM ev_v""".stripMargin)
      .as[(Long, Option[Timestamp])].collect().toMap
    assert(asof == ref && asof.nonEmpty)
  }

  test("whole-stage codegen fuses the merge exec; codegen == interpreted") {
    val rnd = new scala.util.Random(11)
    def t(min: Int): Timestamp = ts(f"2024-01-01 ${8 + min / 60}%02d:${min % 60}%02d:00")
    // long keys (unboxed codegen comparisons) AND string payloads
    val left = (1 to 300).map { i =>
      (rnd.nextInt(10).toLong, t(rnd.nextInt(500)), s"L$i")
    }.toDF("k", "lt", "name")
    val right = (1 to 200).map { i =>
      (rnd.nextInt(10).toLong, t(rnd.nextInt(500)),
        if (i % 7 == 0) None else Some(s"tag$i"), i.toDouble)
    }.toDF("k", "rt", "tag", "v")
      .groupBy("k", "rt").agg(
        org.apache.spark.sql.functions.max("tag").as("tag"),
        org.apache.spark.sql.functions.max("v").as("v"))

    def run() = AsOf.join(left, right, "k", "lt", "rt", Seq("tag", "v"))
    // default session: the merge exec sits INSIDE a WholeStageCodegen
    // stage (its children feed it as stage inputs, SMJ-style). AQE only
    // materializes codegen stages at execution — collect first, then
    // read the FINAL adaptive plan.
    // fallback=false turns a codegen COMPILE failure into a hard error —
    // without it a broken doProduce silently degrades to interpreted
    // (plan string still shows the codegen stage, so string asserts
    // alone can't catch it)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val df = run()
    val genRows = try df.collect().map(_.toSeq).toSet
      finally spark.conf.set("spark.sql.codegen.fallback", "true")
    val finalPlan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    // `*(n) AsOfJoin` = inside codegen stage n (AQE query stages are
    // leaf nodes, so string-match the rendered tree rather than collect)
    assert("""\*\(\d+\) AsOfJoin""".r.findFirstIn(finalPlan.toString).isDefined,
      "AsOfJoinExec not inside WholeStageCodegen:\n" + finalPlan.toString)

    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpRows = run().collect().map(_.toSeq).toSet
      assert(genRows == interpRows)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")

    // string keys exercise the generic-comparator codegen (UTF8String
    // buffered across reused iterator rows)
    import org.apache.spark.sql.functions.{concat, lit}
    val sLeft = left.select(concat(lit("k"), $"k".cast("string")).as("k"),
      $"lt", $"name")
    val sRight = right.select(concat(lit("k"), $"k".cast("string")).as("k"),
      $"rt", $"tag", $"v")
    val sNative = AsOf.join(sLeft, sRight, "k", "lt", "rt", Seq("tag", "v"))
      .collect().map(_.toSeq).toSet
    val sWindow = AsOf.joinViaWindow(sLeft, sRight, "k", "lt", "rt", Seq("tag", "v"))
      .collect().map(_.toSeq).toSet
    assert(sNative == sWindow)
  }
}
