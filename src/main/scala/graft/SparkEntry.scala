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
  *     result; final cast to a fixed decimal type in BOTH engines;
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

  private def decSum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast("decimal(18,4)")).cast("decimal(38,4)")

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
    }
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin
  )
}

/** Placeholder objects filled in as operator families land. */
object MigrationQueries {
  val all: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracles: Map[String, String] = Map()
}

object PipelineQueries {
  val all: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracles: Map[String, String] = Map()
}
