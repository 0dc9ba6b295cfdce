package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 (or a
  * north-star extension operator); [[oracleSql]] carries the DuckDB
  * equivalent for the driver's correctness gate. Cross-engine
  * determinism rules used throughout:
  *   - sums over doubles go through `decimal(18,4)` so aggregation
  *     order (Spark partial aggs vs DuckDB serial) cannot change the
  *     result — but the FINAL emitted type is DOUBLE in both engines:
  *     the gate reads our parquet via pandas (decimal128 surfaces as
  *     `Decimal('x.4300')`, scale kept) and the oracle via duckdb
  *     `.df()` (DECIMAL -> float64, "x.43"), so emitting decimal means
  *     a string-level mismatch whenever the 4th decimal is 0. Both
  *     engines' decimal->double casts are correctly rounded (verified
  *     empirically), so the doubles are bit-identical;
  *   - never a bare DuckDB `SUM(int)` in the oracle — that's HUGEINT,
  *     which `.df()` turns into float64 ("56.0" vs our "56"); wrap in
  *     CAST(... AS BIGINT);
  *   - no raw LIMIT without total ordering;
  *   - timestamps are compared/grouped via date_trunc, never emitted
  *     at sub-second precision (events.ts is ns in parquet, Spark
  *     truncates to micros).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.all ++ MigrationQueries.all ++ PipelineQueries.all

  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ MigrationQueries.oracles ++ PipelineQueries.oracles
}

/** Classic analytic queries over the TPC-H-ish testdata: scan, filter,
  * aggregate, join, window, top-k, set ops. These exercise the engine
  * surface a user of the reference's *source* warehouse (MaxCompute SQL,
  * SURVEY.md §2.7-2.8) relies on, re-expressed Spark-first.
  */
object CoreQueries {

  /** Order-insensitive sum of a double column: accumulate in exact
    * decimal(18,4), emit as double (gate-safe; see determinism rules).
    */
  private def decSum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast("decimal(18,4)")).cast("double")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          decSum($"l_quantity").as("sum_qty"),
          decSum($"l_extendedprice").as("sum_base_price"),
          decSum($"l_extendedprice" * (lit(1) - $"l_discount")).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    },

    // 3-way join: small dims broadcast, fact shuffles once. The fact is
    // pre-aggregated to order grain FIRST — a per-segment countDistinct
    // would plan an Expand (one duplicated fact row per distinct agg)
    // and a second wide shuffle; aggregating revenue by l_orderkey makes
    // n_orders a plain count and shrinks the join input ~4x (measured
    // 1.95s → 1.33s at sf0.1, same results; decimal sums reassociate
    // exactly). At 100 TB: one fact shuffle on the natural key, then
    // dims broadcast onto the compacted stream.
    "q3_join" -> { (s, dir) =>
      import s.implicits._
      val cust = Tables(s, dir, "customer")
      val ord = Tables(s, dir, "orders")
      val li = Tables(s, dir, "lineitem")
      val perOrder = li.groupBy($"l_orderkey")
        .agg(sum(($"l_extendedprice" * (lit(1) - $"l_discount"))
          .cast("decimal(18,4)")).as("rev"))
      perOrder.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(sum($"rev").cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
    },

    // Window function: top order per customer (deterministic tiebreak).
    "q_window" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      Tables(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"o_custkey", $"o_orderkey",
          $"o_totalprice".as("top_price"))
    },

    // Top-k with total ordering (sort + limit → TakeOrderedAndProject,
    // no full sort at scale).
    "q_topk" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "orders")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(10)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    },

    // Set operation: nations having both customers and suppliers.
    "q_setops" -> { (s, dir) =>
      val cust = Tables(s, dir, "customer").select("c_nationkey").distinct()
      val supp = Tables(s, dir, "supplier")
        .select(col("s_nationkey").as("c_nationkey")).distinct()
      cust.intersect(supp).withColumnRenamed("c_nationkey", "nationkey")
    },

    // Semi/anti join: customers with no orders.
    // anti-join against orders above a price floor: "never bought at
    // all" is EMPTY at every SF on this generator (each customer has
    // orders), which made the gate trivially true; 420k yields a
    // non-empty, scale-stable complement (32/291/3040 rows at
    // sf0.001/0.01/0.1) and the filter pushes below the join.
    "q_anti_join" -> { (s, dir) =>
      import s.implicits._
      val cust = Tables(s, dir, "customer")
      val ord = Tables(s, dir, "orders").filter($"o_totalprice" > 420000)
      cust.join(ord, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
    },

    // TPC-H Q5 shape: 6-table join, dims broadcast, one fact shuffle.
    "q5_join" -> { (s, dir) =>
      import s.implicits._
      val cust = Tables(s, dir, "customer")
      val ord = Tables(s, dir, "orders")
      val li = Tables(s, dir, "lineitem")
      val supp = Tables(s, dir, "supplier")
      val nat = Tables(s, dir, "nation")
      val reg = Tables(s, dir, "region")
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .join(broadcast(supp),
          $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(reg.filter($"r_name" === "ASIA")),
          $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(decSum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"),
          count(lit(1)).as("n"))
    },

    // Multi-level aggregation: ROLLUP over (returnflag, linestatus).
    "q_rollup" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          decSum($"l_quantity").as("sum_qty"))
    },

    // TPC-H Q14 shape: per-brand revenue share of one part type —
    // broadcast dim join + conditional decimal-accumulated aggregate
    // (covers the one table no other query touched).
    "q14_promo" -> { (s, dir) =>
      import s.implicits._
      val l = Tables(s, dir, "lineitem")
      val p = Tables(s, dir, "part")
      // pre-aggregate the fact to part grain in EXACT decimal before
      // the broadcast join (the q3_join trick): the brand agg then
      // reads |part| rows, not |lineitem|, and decimal associativity
      // keeps the two-level sum bit-identical to the one-level oracle
      val perPart = l.groupBy($"l_partkey")
        .agg(sum(($"l_extendedprice" * (lit(1) - $"l_discount"))
            .cast("decimal(18,4)")).as("rev"),
          count(lit(1)).as("cnt"))
      perPart.join(broadcast(p), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand")
        .agg(
          sum(when($"p_type".startsWith("STANDARD"), $"rev")
            .otherwise(lit(0).cast("decimal(28,4)")))
            .cast("double").as("standard_revenue"),
          sum($"rev").cast("double").as("total_revenue"),
          sum($"cnt").as("n"))
    },

    // Skew-resistant salted join: the hot-key fact side gets a row-hash
    // salt, the dim side replicates saltFactor times, so one hot key
    // spreads over saltFactor reducers; results == the plain join (the
    // oracle). Aggregated to order counts per segment for a stable gate.
    "q_skew_join" -> { (s, dir) =>
      import s.implicits._
      val joined = graft.operators.Skew.saltedJoin(
        Tables(s, dir, "orders").select($"o_custkey", $"o_totalprice"),
        Tables(s, dir, "customer").select($"c_custkey".as("o_custkey"),
          $"c_mktsegment"),
        key = "o_custkey", saltFactor = 8)
      joined.groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          decSum($"o_totalprice").as("sum_price"))
    },

    // Skew-resistant two-phase aggregation: pre-aggregate on
    // (key, salt) so one hot key spreads over saltFactor reducers
    // before the final combine — decimal accumulation keeps the result
    // bit-identical to the direct single-phase oracle.
    "q_salted_agg" -> { (s, dir) =>
      import s.implicits._
      graft.operators.Skew.twoPhaseAgg(
        Tables(s, dir, "events")
          .select($"event_type",
            $"value".cast("decimal(18,4)").as("value"),
            lit(1L).as("one")),
        key = "event_type", saltFactor = 8,
        partial = Map("value" -> (c => sum(c)), "one" -> (c => sum(c))),
        combine = Map("value" -> (c => sum(c)), "one" -> (c => sum(c))))
        .select($"event_type", $"value".cast("double").as("sum_value"),
          $"one".as("n"))
    },

    // JSON processing: extract a typed field from the semi-structured
    // props column and aggregate — get_json_object is codegen'd path
    // extraction, no UDF and no full from_json materialization when
    // only one field is read.
    "q_json" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events")
        .select($"event_type",
          get_json_object($"props", "$.k").cast("long").as("k"))
        .groupBy($"event_type")
        .agg(count($"k").as("n"), sum($"k").as("sum_k"),
          max($"k").as("max_k"))
    },

    // Bloom-pruned join: lineitem filtered by a Bloom sketch of urgent
    // orders BEFORE its shuffle; the real join removes the sketch's
    // false positives, so results == the plain join (the oracle).
    "q_bloom_join" -> { (s, dir) =>
      import s.implicits._
      val urgent = Tables(s, dir, "orders")
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey", $"o_custkey")
      graft.operators.BloomPrune.join(
          Tables(s, dir, "lineitem")
            .select($"l_orderkey", $"l_extendedprice", $"l_discount"),
          urgent, "l_orderkey", "o_orderkey",
          expectedItems = 200000L, numBits = 4L * 1024 * 1024)
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_items"),
          decSum($"l_extendedprice" * (lit(1) - $"l_discount"))
            .as("revenue"))
    },

    // Market-basket co-occurrence: event-type pairs by distinct-user
    // support, plus lift. Per-user type sets are tiny (5 types), so the
    // pair explode is bounded; support counts partial-aggregate.
    "q_cooccur" -> { (s, dir) =>
      import s.implicits._
      // the distinct frame feeds FOUR consumers (self-join both sides,
      // singles, total) — materialize it once instead of re-scanning
      // the events table per consumer
      val ut = Tables(s, dir, "events")
        .select($"user_id", $"event_type").distinct()
        .localCheckpoint(true)
      // total stays IN the plan as a broadcast 1-row aggregate — no
      // eager driver action at query-build time
      val total = ut.select($"user_id").distinct()
        .agg(count(lit(1)).cast("double").as("total"))
      val pairs = ut.as("a").join(ut.as("b"),
          $"a.user_id" === $"b.user_id" &&
            $"a.event_type" < $"b.event_type")
        .groupBy($"a.event_type".as("type_a"), $"b.event_type".as("type_b"))
        .agg(count(lit(1)).as("support"))
      val singles = ut.groupBy($"event_type").agg(count(lit(1)).as("n"))
      pairs
        .join(broadcast(singles.select($"event_type".as("type_a"),
          $"n".as("n_a"))), "type_a")
        .join(broadcast(singles.select($"event_type".as("type_b"),
          $"n".as("n_b"))), "type_b")
        .crossJoin(broadcast(total))
        .select($"type_a", $"type_b", $"support",
          ($"support".cast("double") * $"total" /
            ($"n_a" * $"n_b").cast("double")).as("lift"))
    },

    // Exact group quantiles: percentile() is an exact sort-based
    // aggregate; quantity values are integers so the linear
    // interpolation is bit-exact in double across engines (fractions
    // are dyadic). At 100 TB swap for approx_percentile (t-digest).
    "q_quantiles" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))")
          .as("qs"), count(lit(1)).as("n"))
        .select($"l_returnflag",
          element_at($"qs", 1).as("q25"),
          element_at($"qs", 2).as("q50"),
          element_at($"qs", 3).as("q75"), $"n")
    },

    // Explicit GROUPING SETS (finer than rollup/cube): (priority, flag),
    // (priority), and grand total — one Expand pass, no self-union.
    "q_grouping_sets" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "orders")
        .groupingSets(
          Seq(Seq($"o_orderpriority", $"o_orderstatus"),
            Seq($"o_orderpriority"), Seq()),
          $"o_orderpriority", $"o_orderstatus")
        .agg(count(lit(1)).as("n"), decSum($"o_totalprice").as("sum_price"))
    },

    // TPC-H Q7 shape: bilateral order volume between nation pairs by
    // year — the fact joins two independent broadcast dimension chains
    // (supplier→nation, order→customer→nation) and groups on a derived
    // year column; one fact shuffle on the final grouping only.
    "q7_volume" -> { (s, dir) =>
      import s.implicits._
      val l = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val su = Tables(s, dir, "supplier")
      val n = Tables(s, dir, "nation")
      val n1 = n.select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation"))
      val n2 = n.select($"n_nationkey".as("c_nk"), $"n_name".as("cust_nation"))
      l.join(broadcast(su.select($"s_suppkey", $"s_nationkey".as("s_nk"))),
          $"l_suppkey" === $"s_suppkey")
        .join(broadcast(n1), "s_nk")
        .join(o.select($"o_orderkey", $"o_custkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c.select($"c_custkey", $"c_nationkey".as("c_nk"))),
          $"o_custkey" === $"c_custkey")
        .join(broadcast(n2), "c_nk")
        .filter($"supp_nation" < $"cust_nation")
        .groupBy($"supp_nation", $"cust_nation",
          year($"o_orderdate").as("l_year"))
        .agg(decSum($"l_extendedprice" * (lit(1) - $"l_discount"))
          .as("revenue"), count(lit(1)).as("n"))
    },

    // Semi-join (EXISTS shape): customers with at least one urgent
    // order — left_semi keeps the probe side unduplicated with no
    // post-join distinct; the filtered build side broadcasts.
    "q_semi_join" -> { (s, dir) =>
      import s.implicits._
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
        .filter($"o_orderpriority" === "1-URGENT")
      c.join(o, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
    },

    // CUBE: all grouping-set combinations of (segment, nation) in one
    // pass — Spark expands grouping sets in a single Expand+agg, no
    // self-union of per-level scans.
    "q_cube" -> { (s, dir) =>
      import s.implicits._
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      c.join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .cube($"c_mktsegment", $"n_name")
        .agg(count(lit(1)).as("n_cust"), decSum($"c_acctbal").as("sum_bal"))
    },

    // Pivot: event counts per day × event_type — DataFrame .pivot with
    // pinned values (deterministic column set), conditional-agg oracle.
    "q_pivot" -> { (s, dir) =>
      import s.implicits._
      graft.Tables(s, dir, "events")
        .select(date_trunc("day", $"ts").as("day"), $"event_type")
        .groupBy($"day")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select($"day", $"click".as("n_click"), $"view".as("n_view"),
          $"purchase".as("n_purchase"), $"signup".as("n_signup"),
          $"error".as("n_error"))
    },

    // Correlated-subquery shape: orders above their customer's average
    // (decorrelated to an aggregate + equi-join — the plan Spark's own
    // decorrelation produces, stated explicitly).
    "q_above_avg" -> { (s, dir) =>
      import s.implicits._
      val o = Tables(s, dir, "orders")
      val avgPer = o.groupBy($"o_custkey")
        .agg((decSum($"o_totalprice") / count(lit(1))).as("avg_price"))
      o.join(avgPer, "o_custkey")
        .filter($"o_totalprice" > $"avg_price")
        .select($"o_orderkey")
    },

    // Exact group median WITHOUT interpolation: element at the lower
    // median position under a total order — engine-exact (interpolated
    // percentile float math differs across engines; this doesn't).
    "q_median" -> { (s, dir) =>
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".asc, $"o_orderkey".asc)
      val n = org.apache.spark.sql.expressions.Window
        .partitionBy($"o_orderpriority")
      Tables(s, dir, "orders")
        .withColumn("rk", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(n))
        .filter($"rk" === floor(($"cnt" + 1) / 2))
        .select($"o_orderpriority", $"o_totalprice".as("median_price"))
    },

    // TPC-H Q2 shape: rows matching their group's minimum (min-cost
    // supplier per part). Decorrelated to a per-key min + equi-join —
    // the plan Spark's own subquery decorrelation produces: one fact
    // shuffle on the key for the min, the join reuses that partitioning,
    // supplier broadcast. min/equality on raw doubles involve no
    // arithmetic, so the filter is engine-exact.
    "q_mincost" -> { (s, dir) =>
      import s.implicits._
      val li = Tables(s, dir, "lineitem")
        .select($"l_partkey", $"l_suppkey", $"l_extendedprice")
      val mins = li.groupBy($"l_partkey")
        .agg(min($"l_extendedprice").as("min_price"))
      li.join(mins, "l_partkey")
        .filter($"l_extendedprice" === $"min_price")
        .join(broadcast(Tables(s, dir, "supplier")),
          $"l_suppkey" === $"s_suppkey")
        .select($"l_partkey", $"l_suppkey", $"s_name", $"min_price")
        .distinct()
    },

    // Window-function breadth: lag/lead/ntile/percent_rank/cume_dist in
    // one per-customer pass (one shuffle + one sort serves all five —
    // same window spec). percent_rank/cume_dist are single integer
    // divisions, bit-exact cross-engine; the (date, key) order is a
    // total order, so no tie ambiguity.
    "q_window_fns" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
      Tables(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey", $"o_totalprice",
          lag($"o_totalprice", 1).over(w).as("prev_price"),
          lead($"o_totalprice", 1).over(w).as("next_price"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cdist"))
    },

    // TPC-H Q22 shape: global scalar subquery (avg balance of positive
    // accounts) broadcast into a filter, then an anti-join against
    // orders — "rich customers with no big-ticket order". The scalar is
    // a 1-row aggregate kept IN the plan (broadcast nested loop), never
    // a driver-side collect; avg = decimal-exact sum / count in ONE
    // double division, bit-exact cross-engine. The anti-join side is
    // pre-filtered (o_totalprice > 400k) BELOW the join: the original
    // "never bought at all" predicate is empty at every gate SF on this
    // generator (every customer orders), which made the gate trivially
    // true — 400k keeps the result non-empty from sf0.001 up while
    // shrinking the anti build side ~10×.
    "q22_idle_rich" -> { (s, dir) =>
      import s.implicits._
      val c = Tables(s, dir, "customer")
      val avgBal = c.filter($"c_acctbal" > 0)
        .agg((decSum($"c_acctbal") / count(lit(1))).as("avg_bal"))
      c.crossJoin(broadcast(avgBal))
        .filter($"c_acctbal" > $"avg_bal")
        .join(Tables(s, dir, "orders").filter($"o_totalprice" > 400000),
          $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"), decSum($"c_acctbal").as("sum_bal"))
    },

    // TPC-H Q10 shape: top-20 customers by returned-item revenue —
    // fact pre-aggregated to order grain in exact decimal (the q3
    // trick), one shuffle to customer grain, dims broadcast, and the
    // global top-k is TakeOrderedAndProject (per-partition heads, no
    // full sort) with a key tiebreak for determinism.
    "q10_returns" -> { (s, dir) =>
      import s.implicits._
      val li = Tables(s, dir, "lineitem").filter($"l_returnflag" === "R")
      val perOrder = li.groupBy($"l_orderkey")
        .agg(sum(($"l_extendedprice" * (lit(1) - $"l_discount"))
          .cast("decimal(18,4)")).as("rev"))
      perOrder.join(Tables(s, dir, "orders"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_custkey")
        .agg(sum($"rev").as("revd"), count(lit(1)).as("n_orders"))
        .join(broadcast(Tables(s, dir, "customer")),
          $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables(s, dir, "nation")),
          $"c_nationkey" === $"n_nationkey")
        .select($"c_custkey", $"c_name", $"n_name",
          $"revd".cast("double").as("revenue"), $"n_orders")
        .orderBy($"revenue".desc, $"c_custkey".asc)
        .limit(20)
    },

    // GK-sketch quantiles (operators/Sketch.quantiles): fixed-size
    // mergeable summary instead of q_quantiles' exact sort-based
    // percentile. At accuracy >= group size GK never compresses, so the
    // result is exactly the rank-ceil(p*n) element (= quantile_disc) —
    // which is what the oracle checks; at 100 TB lower the accuracy
    // knob and the same plan gives bounded-rank-error answers.
    "sketch_quantiles" -> { (s, dir) =>
      import s.implicits._
      graft.operators.Sketch.quantiles(Tables(s, dir, "orders"),
          "o_orderpriority", "o_totalprice", Seq(0.25, 0.5, 0.75))
        .select($"o_orderpriority",
          element_at($"qs", 1).as("q25"),
          element_at($"qs", 2).as("q50"),
          element_at($"qs", 3).as("q75"), $"n")
    },

    // Mergeable-HLL distinct rollup (operators/Sketch): per-month
    // customer register tables unioned to one estimate — the
    // stored-sketch pattern that answers "distinct users this quarter"
    // from |groups|*4096 rows instead of a 100 TB rescan. Uses the
    // PORTABLE HLL (md5-prefix hash, bin()-length rho, scaled-integer
    // harmonic sum) so the whole distributed pipeline is oracle-checked
    // bit-exactly; the DataSketches binary variant (hllSketches/
    // hllRollup) remains the drop-in production alternative with
    // merge-equality and error bounds asserted in SketchSpec.
    "sketch_hll_rollup" -> { (s, dir) =>
      import s.implicits._
      graft.operators.Sketch.portableRollup(
        graft.operators.Sketch.portableRegisters(
          Tables(s, dir, "orders")
            .withColumn("m", month($"o_orderdate")),
          "m", "o_custkey"))
    },

    // SQL frontend: the same engine drives spark.sql over registered
    // views (the reference's users talk SQL to the source warehouse).
    "q_sql" -> { (s, dir) =>
      Tables(s, dir, "orders").createOrReplaceTempView("orders_v")
      Tables(s, dir, "customer").createOrReplaceTempView("customer_v")
      s.sql("""
        SELECT o_orderpriority, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        FROM orders_v JOIN customer_v ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderpriority""")
    },

    // Time-based RANGE window frame: per customer, the 90-day trailing
    // revenue and order count at each order — the frame rows-based
    // windows cannot express (peers = calendar distance, not row
    // count). Ordered by integer day number so the frame bound is
    // exact; the sum accumulates in decimal so frame-internal order
    // can't perturb the emitted double. One shuffle on the customer
    // key, O(window-span) state per key in the range-frame evaluator.
    "q_trailing_window" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val dayNum = datediff(to_date($"o_orderdate"),
        lit("1970-01-01").cast("date"))
      val w = Window.partitionBy($"o_custkey").orderBy(dayNum)
        .rangeBetween(-89, Window.currentRow)
      Tables(s, dir, "orders").select($"o_custkey", $"o_orderkey",
        sum($"o_totalprice".cast("decimal(18,4)")).over(w)
          .cast("double").as("trail_sum"),
        count(lit(1)).over(w).as("n_trail"))
    },

    // Cohort retention matrix: users bucketed by first-activity week ×
    // activity week — the classic growth-analytics shape. Distinct
    // (user, week) first (shuffle carries pairs, not events), cohort =
    // a per-user min that reuses the user partitioning, final agg is
    // |weeks|² rows. All counts — engine-exact.
    "q_retention" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir, "events")
        .select($"user_id", date_trunc("week", $"ts").as("w")).distinct()
      val cohort = ev.groupBy($"user_id").agg(min($"w").as("cohort_w"))
      ev.join(cohort, "user_id")
        .groupBy($"cohort_w", $"w")
        .agg(count(lit(1)).as("n_users"))
    },

    // Per-group correlation + least-squares regression from EXACT
    // decimal moments (n, Σx, Σy, Σx², Σy², Σxy accumulate in decimal —
    // order-insensitive), combined into corr/slope/intercept with one
    // identical double expression tree in both engines. The moment
    // trick is the 100 TB shape too: one partial-aggregable pass, six
    // numbers per group, no second scan — and it sidesteps the
    // float-nondeterminism that makes naive corr() un-gateable.
    "q_corr_regr" -> { (s, dir) =>
      import s.implicits._
      val li = Tables(s, dir, "lineitem").select(
        $"l_returnflag", $"l_linestatus",
        $"l_quantity".cast("decimal(12,3)").as("x"),
        $"l_extendedprice".cast("decimal(12,3)").as("y"))
      val m = li.groupBy($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum($"x").cast("double").as("sx"),
          sum($"y").cast("double").as("sy"),
          sum($"x" * $"x").cast("double").as("sxx"),
          sum($"y" * $"y").cast("double").as("syy"),
          sum($"x" * $"y").cast("double").as("sxy"))
      val nd = $"n".cast("double")
      val covN = nd * $"sxy" - $"sx" * $"sy"
      val varX = nd * $"sxx" - $"sx" * $"sx"
      val varY = nd * $"syy" - $"sy" * $"sy"
      val slope = covN / varX
      // emit as scaled integers: the derived stats pass through sqrt /
      // division, whose doubles are NOT guaranteed bit-identical across
      // engines (observed 1-ulp corr drift vs DuckDB); rounding to a
      // fixed decimal scale absorbs ulp noise and the BIGINT emission
      // is representation-invariant in the gate
      m.select($"l_returnflag", $"l_linestatus", $"n",
        round((covN / sqrt(varX * varY)) * 1e9).cast("long")
          .as("corr_e9"),
        round(slope * 1e6).cast("long").as("slope_e6"),
        round((($"sy" - slope * $"sx") / nd) * 1e6).cast("long")
          .as("intercept_e6"))
    },

    // Bucketed co-located join AS A GATE: both sides persist
    // bucketed+sorted by the join key, the merge-hinted join runs over
    // the bucketed scans, and the aggregate groups BY the bucket key so
    // it reuses the same partitioning — the whole measured plan has
    // ZERO shuffle exchanges, and that plan-shape property is asserted
    // INSIDE the query (a require that fails the gate, not just a
    // spec). This is the 100 TB trade the operator exists for: one
    // layout write converts every subsequent join + agg on the key into
    // a shuffle-free scan.
    "q_bucketed_join" -> { (s, dir) =>
      import s.implicits._
      graft.operators.Bucketed.writeBucketed(
        Tables(s, dir, "orders").select($"o_custkey", $"o_totalprice"),
        "g_orders_bkt", "o_custkey", buckets = 8)
      graft.operators.Bucketed.writeBucketed(
        Tables(s, dir, "customer")
          .select($"c_custkey".as("o_custkey"), $"c_mktsegment"),
        "g_cust_bkt", "o_custkey", buckets = 8)
      val out = graft.operators.Bucketed
        .colocatedJoin(s, "g_orders_bkt", "g_cust_bkt", "o_custkey")
        .groupBy($"o_custkey", $"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum($"o_totalprice".cast("decimal(18,4)")).cast("double")
            .as("sum_price"))
      val ex = graft.operators.Bucketed.countExchanges(out)
      require(ex == 0,
        s"bucketed join+agg must be shuffle-free; plan has $ex Exchange(s)")
      out
    }
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_join" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q_window" ->
      """SELECT o_custkey, o_orderkey,
        |  o_totalprice AS top_price
        |FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_custkey,
        |  o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q_setops" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 420000)""".stripMargin,

    "q5_join" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "q_sql" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderpriority""".stripMargin,

    "q14_promo" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(CASE WHEN p_type LIKE 'STANDARD%'
        |      THEN l_extendedprice * (1 - l_discount) ELSE 0 END
        |    AS DECIMAL(18,4))) AS DOUBLE) AS standard_revenue,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue,
        |  COUNT(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,

    "q_skew_join" ->
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q_salted_agg" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type""".stripMargin,

    "q_json" ->
      """SELECT event_type, CAST(COUNT(k) AS BIGINT) AS n,
        |  CAST(SUM(k) AS BIGINT) AS sum_k, CAST(MAX(k) AS BIGINT) AS max_k
        |FROM (SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |GROUP BY event_type""".stripMargin,

    "q_bloom_join" ->
      """SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_custkey""".stripMargin,

    "q_cooccur" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |t AS (SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS total
        |  FROM events),
        |s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM ut GROUP BY 1),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    CAST(COUNT(*) AS BIGINT) AS support
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, support,
        |  CAST(support AS DOUBLE) * t.total
        |    / CAST(sa.n * sb.n AS DOUBLE) AS lift
        |FROM p CROSS JOIN t
        |JOIN s sa ON sa.event_type = p.type_a
        |JOIN s sb ON sb.event_type = p.type_b""".stripMargin,

    "q_quantiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS q25,
        |  quantile_cont(l_quantity, 0.50) AS q50,
        |  quantile_cont(l_quantity, 0.75) AS q75,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
        |  (o_orderpriority), ())""".stripMargin,

    "q7_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(o_orderdate) AS INT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name < n2.n_name
        |GROUP BY 1, 2, 3""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin,

    "q_cube" ->
      """SELECT c_mktsegment, n_name, CAST(COUNT(*) AS BIGINT) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE (c_mktsegment, n_name)""".stripMargin,

    "q_pivot" ->
      """SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
        |  CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_click,
        |  CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS n_view,
        |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
        |  CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS n_signup,
        |  CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_error
        |FROM events GROUP BY 1""".stripMargin,

    "q_above_avg" ->
      """SELECT o_orderkey FROM orders o
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |           / COUNT(*)
        |  FROM orders i WHERE i.o_custkey = o.o_custkey)""".stripMargin,

    "q10_returns" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,

    "sketch_quantiles" ->
      """SELECT o_orderpriority,
        |  quantile_disc(o_totalprice, 0.25) AS q25,
        |  quantile_disc(o_totalprice, 0.50) AS q50,
        |  quantile_disc(o_totalprice, 0.75) AS q75,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    // Portable-HLL rollup: per-register max is associative, so merging
    // per-month register tables equals building registers globally —
    // the oracle computes the global form directly. All pre-estimate
    // state is exact integers; the one double branch mirrors the Spark
    // expression tree op-for-op and is emitted rounded to BIGINT.
    "sketch_hll_rollup" ->
      """WITH h AS (
        |  SELECT ('0x'||substr(md5(CAST(o_custkey AS VARCHAR)),1,15))::BIGINT
        |    AS h FROM orders WHERE o_custkey IS NOT NULL),
        |b AS (SELECT h >> 48 AS reg, h & 281474976710655 AS r FROM h),
        |reg AS (SELECT reg,
        |    MAX(CASE WHEN r = 0 THEN 49 ELSE 49 - length(bin(r)) END) AS rho
        |  FROM b GROUP BY reg),
        |s AS (SELECT
        |    COALESCE(CAST(SUM(1::BIGINT << (49 - rho)) AS BIGINT), 0)
        |      + (4096 - COUNT(*)) * 562949953421312 AS hsum,
        |    4096 - COUNT(*) AS v
        |  FROM reg)
        |SELECT CAST(round(CASE
        |    WHEN 6.810691763087074e21 / CAST(hsum AS DOUBLE) <= 10240.0
        |         AND v > 0
        |    THEN 4096.0 * ln(4096.0 / CAST(v AS DOUBLE))
        |    ELSE 6.810691763087074e21 / CAST(hsum AS DOUBLE) END) AS BIGINT)
        |    AS n_distinct_approx,
        |  CAST(hsum AS BIGINT) AS harmonic_sum_scaled,
        |  CAST(v AS BIGINT) AS zero_registers
        |FROM s""".stripMargin,

    "q_mincost" ->
      """SELECT DISTINCT l_partkey, l_suppkey, s_name,
        |  l_extendedprice AS min_price
        |FROM lineitem l JOIN supplier ON l_suppkey = s_suppkey
        |WHERE l_extendedprice = (
        |  SELECT min(l_extendedprice) FROM lineitem i
        |  WHERE i.l_partkey = l.l_partkey)""".stripMargin,

    "q_window_fns" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cdist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin,

    "q22_idle_rich" ->
      """WITH a AS (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
        |      / COUNT(*) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |FROM customer, a
        |WHERE c_acctbal > a.avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |GROUP BY c_mktsegment""".stripMargin,

    "q_median" ->
      """SELECT o_orderpriority, o_totalprice AS median_price FROM (
        |  SELECT o_orderpriority, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice ASC, o_orderkey ASC) AS rk,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS cnt
        |  FROM orders)
        |WHERE rk = (cnt + 1) // 2""".stripMargin,

    "q_trailing_window" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY datediff('day', DATE '1970-01-01',
        |                      CAST(o_orderdate AS DATE))
        |    RANGE BETWEEN 89 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS trail_sum,
        |  CAST(COUNT(*) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY datediff('day', DATE '1970-01-01',
        |                      CAST(o_orderdate AS DATE))
        |    RANGE BETWEEN 89 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_trail
        |FROM orders""".stripMargin,

    "q_retention" ->
      """WITH ev AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
        |      AS w FROM events),
        |c AS (SELECT user_id, min(w) AS cohort_w FROM ev GROUP BY 1)
        |SELECT c.cohort_w, ev.w, CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM ev JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    "q_corr_regr" ->
      """WITH m AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,3))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,3))) AS DOUBLE)
        |      AS sy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,3))
        |           * CAST(l_quantity AS DECIMAL(12,3))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,3))
        |           * CAST(l_extendedprice AS DECIMAL(12,3))) AS DOUBLE)
        |      AS syy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,3))
        |           * CAST(l_extendedprice AS DECIMAL(12,3))) AS DOUBLE)
        |      AS sxy
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, l_linestatus, n,
        |  CAST(round((CAST(n AS DOUBLE) * sxy - sx * sy)
        |    / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
        |         * (CAST(n AS DOUBLE) * syy - sy * sy)) * 1e9) AS BIGINT)
        |    AS corr_e9,
        |  CAST(round((CAST(n AS DOUBLE) * sxy - sx * sy)
        |    / (CAST(n AS DOUBLE) * sxx - sx * sx) * 1e6) AS BIGINT)
        |    AS slope_e6,
        |  CAST(round((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
        |         / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
        |    / CAST(n AS DOUBLE) * 1e6) AS BIGINT) AS intercept_e6
        |FROM m""".stripMargin,

    // q_bucketed_join: the bucketed LAYOUT cannot change the rows — the
    // oracle is the plain join+agg; the zero-shuffle plan shape is
    // require()d inside the registered query itself.
    "q_bucketed_join" ->
      """SELECT o_custkey, c_mktsegment,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY o_custkey, c_mktsegment""".stripMargin
  )
}
