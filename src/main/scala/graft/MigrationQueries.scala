package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.MigrateFunctions
import graft.model._
import graft.transform.{CastPipeline, MappingTransform}

/** SURVEY.md §2 operator inventory as driver-checkable queries. Each entry
  * exercises one reference operator family THROUGH the library code
  * (CastPipeline / MappingTransform / MigrateFunctions), with a DuckDB
  * oracle expressing identical semantics in ANSI SQL.
  */
object MigrationQueries {

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S2/S3 + P1/P2: partition-style pruning — resolve the latest day via
    // a MAX probe (the reference's two-query pattern,
    // maxcompute_client.py:219-259), then scan only that day.
    "mig_scan_prune" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir, "events")
      val latest = ev.filter($"ts".isNotNull)
        .agg(max(date_trunc("DAY", $"ts"))).head().getTimestamp(0)
      ev.filter(date_trunc("DAY", $"ts") === lit(latest))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"value".cast("decimal(18,4)")).cast("double").as("sum_value"))
    },

    // P3/P5/P6: projection + rename + reorder.
    "mig_projection_rename" -> { (s, dir) =>
      val df = Tables(s, dir, "customer")
      MappingTransform(df, MappingPlan(
        include = Some(Seq("c_custkey", "c_name", "c_acctbal")),
        rename = Map("c_custkey" -> "id", "c_name" -> "name"),
        order = Seq("id", "name", "c_acctbal")))
    },

    // T1/T2: catalog-driven casts with malformed → null (errors='coerce').
    "mig_cast_pipeline" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val casted = CastPipeline(docs, Seq(
        SourceColumn("doc_id", "string"), // numeric-looking stays string
        SourceColumn("n_chars", "bigint"),
        SourceColumn("lang", "string")))
      casted.select($"doc_id", $"n_chars", $"lang",
        $"source".try_cast("bigint").as("source_as_int")) // malformed → null
    },

    // T6: temporal try_cast leniency — planted mixed-validity strings;
    // invalid dates coerce to NULL, date-only strings get midnight.
    "mig_temporal_cast" -> { (s, dir) =>
      import s.implicits._
      val raw = when(pmod($"doc_id", lit(4)) === 0, lit("2024-01-15 10:30:00"))
        .when(pmod($"doc_id", lit(4)) === 1, lit("2024-13-45 99:99:99"))
        .when(pmod($"doc_id", lit(4)) === 2, lit("2024-02-01"))
        .otherwise(lit("not a date"))
      Tables(s, dir, "documents").select($"doc_id",
        CastPipeline.castColumn(raw, "timestamp", CompatConfig.default)
          .as("ts_out"))
    },

    // Profiling: fixed-width value histogram of order totals — one
    // aggregate pass, portable floor-bin arithmetic.
    "mig_histogram" -> { (s, dir) =>
      graft.operators.Profile.histogram(
        Tables(s, dir, "orders"), "o_totalprice", width = 25000.0)
    },

    // Profiling: top-5 most frequent values of the categorical columns
    // (bounded-heap per-column top-k; operators/Profile.topValues).
    "mig_top_values" -> { (s, dir) =>
      graft.operators.Profile.topValues(
        Tables(s, dir, "documents"), Seq("lang", "source"), k = 5)
    },

    // SCD1 / CDC compaction: latest purchase value per user — a single
    // map-side-combinable max_by aggregate (the change-log compaction
    // shape; contrast mig_scd2 which keeps full history).
    "mig_compact" -> { (s, dir) =>
      import s.implicits._
      graft.operators.Scd.latestSnapshot(
          Tables(s, dir, "events").filter($"event_type" === "purchase"),
          "user_id", "ts", "value", "event_id")
        .select($"k".as("user_id"), $"attr".as("value"), $"last_us")
    },

    // SCD2 history build from a change log: per-user purchase `value`
    // versions with [valid_from, valid_to) epoch-micro bounds and an
    // is_current flag — tie-broken per timestamp, no-change rows
    // collapsed. One key-partitioned shuffle end to end.
    "mig_scd2" -> { (s, dir) =>
      import s.implicits._
      graft.operators.Scd.scd2FromChangeLog(
          Tables(s, dir, "events").filter($"event_type" === "purchase"),
          "user_id", "ts", "value", "event_id")
        .select($"k".as("user_id"), $"attr".as("value"),
          $"valid_from_us", $"valid_to_us", $"is_current")
    },

    // MERGE INTO (upsert + tombstones) applied as one full-outer join:
    // a deterministic change batch (doubled totals for keys %10,
    // tombstones for %97, fresh inserts shifted by +10M for %13) onto
    // the orders base — whole-row replace semantics, oracle replays the
    // identical batch in SQL (operators/Scd.mergeUpsert).
    "mig_merge_upsert" -> { (s, dir) =>
      import s.implicits._
      val base = Tables(s, dir, "orders")
      val updates = base
        .filter($"o_orderkey" % 10 === 0 && $"o_orderkey" % 97 =!= 0)
        .withColumn("o_totalprice", $"o_totalprice" * 2)
        .withColumn("_del", lit(false))
      val deletes = base.filter($"o_orderkey" % 97 === 0)
        .withColumn("_del", lit(true))
      val inserts = base.filter($"o_orderkey" % 13 === 0)
        .withColumn("o_orderkey", $"o_orderkey" + 10000000L)
        .withColumn("_del", lit(false))
      graft.operators.Scd.mergeUpsert(base,
        updates.unionByName(deletes).unionByName(inserts),
        "o_orderkey", deletedCol = Some("_del"))
    },

    // T13: conversion-error analysis as a distributed query — count +
    // sample of the values the declared type would coerce to NULL
    // (CastDiagnostics.sampleFailures runs this same predicate).
    "mig_cast_errors" -> { (s, dir) =>
      import s.implicits._
      val d = Tables(s, dir, "documents").select($"doc_id",
        when(pmod($"doc_id", lit(3)) === 0,
          concat(lit("x"), $"doc_id".cast("string")))
          .otherwise($"doc_id".cast("string")).as("raw"))
      val casted = CastPipeline.castColumn($"raw", "int", CompatConfig.default)
      d.filter($"raw".isNotNull && casted.isNull)
        .agg(count(lit(1)).as("n_failures"), min($"raw").as("sample_min"))
    },

    // D2: destination DB-default fill on non-nullable columns (string +
    // numeric literal coercion) via the ConstraintEnforcer path.
    "mig_db_defaults" -> { (s, dir) =>
      import s.implicits._
      val d = Tables(s, dir, "documents").select($"doc_id",
        when(pmod($"doc_id", lit(5)) === 0, lit(null).cast("string"))
          .otherwise($"lang").as("lang2"),
        when(pmod($"doc_id", lit(7)) === 0, lit(null).cast("long"))
          .otherwise($"doc_id").as("num2"))
      graft.transform.ConstraintEnforcer.applyDbDefaults(d, Seq(
        DestColumn("lang2", "varchar(10)", nullable = false,
          default = Some("unknown")),
        DestColumn("num2", "bigint", nullable = false,
          default = Some("42"))))
    },

    // T4: lenient boolean parse over real data ('N' parses false, rest null).
    "mig_bool_parse" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber",
          MigrateFunctions.lenientBool($"l_returnflag").as("flag_bool"))
    },

    // T5/§2.6: null-token stripping (the non-default compat mode).
    "mig_null_tokens" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "documents")
        .select($"doc_id",
          MigrateFunctions.stripNullTokens($"source",
            CompatConfig.DefaultNullTokens).as("source_tok"))
    },

    // T8 + D1: empty-string → null, then default fill.
    "mig_empty_null_default" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "documents")
        .select($"doc_id",
          coalesce(MigrateFunctions.emptyToNull($"lang"), lit("und")).as("lang_filled"))
    },

    // §2.4: every whitelisted computed function in one mapping.
    "mig_computed" -> { (s, dir) =>
      val df = Tables(s, dir, "customer")
      MappingTransform(df, MappingPlan(
        rename = Map("c_mktsegment" -> "segment"),
        computed = Seq(
          ComputedColumn("seg_code", "upper", Seq("segment")),
          ComputedColumn("seg3", "substr", Seq("segment", "0", "3")),
          ComputedColumn("who", "concat", Seq("c_name", "@", "segment")),
          ComputedColumn("label", "format", Seq("{c_custkey:08d}-{seg3}"))),
        include = None,
        order = Seq("c_custkey", "label", "who", "seg_code", "seg3", "segment"),
        exclude = Seq("c_nationkey", "c_acctbal")))
    },

    // D3 fail policy's one-pass null-count aggregate.
    "mig_null_counts" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events").agg(
        count(when($"value".isNull, lit(1))).as("n_value_nulls"),
        count(when($"props".isNull, lit(1))).as("n_props_nulls"),
        count(lit(1)).as("n_rows"))
    },

    // P7/D3 skip policy: drop rows violating non-null.
    "mig_skip_policy" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events").na.drop("any", Seq("value"))
        .select($"event_id", $"value")
    },

    // S3/S4: latest-"partition" value lookup (global max + count probe).
    "mig_latest_partition" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "orders")
        .agg(max($"o_orderdate").as("latest_date"), count(lit(1)).as("n"))
    },

    // Data profiling (migration QA): one agg pass over all columns.
    "mig_profile" -> { (s, dir) =>
      graft.operators.Profile.summarize(
        Tables(s, dir, "orders")
          .select("o_custkey", "o_orderstatus", "o_orderpriority"))
    },

    // T7/T12: ±inf → null cleanup on floating columns (infs injected
    // deterministically since the testdata has none).
    "mig_inf_cleanup" -> { (s, dir) =>
      import s.implicits._
      val withInf = Tables(s, dir, "events")
        .select($"event_id",
          when(pmod($"event_id", lit(7)) === 0, lit(Double.PositiveInfinity))
            .otherwise($"value").as("value"))
      graft.transform.CastPipeline.basicCleanup(withInf)
        .withColumnRenamed("value", "value_clean")
    },

    // O1-O3 end-to-end: the full transform chain (cast → mapping → order)
    // exactly as Migrator.transform wires it.
    "mig_migrate_e2e" -> { (s, dir) =>
      val df = Tables(s, dir, "customer")
      val casted = CastPipeline(df, Seq(
        SourceColumn("c_custkey", "bigint"),
        SourceColumn("c_name", "string"),
        SourceColumn("c_nationkey", "bigint"),
        SourceColumn("c_acctbal", "decimal(18,4)"),
        SourceColumn("c_mktsegment", "string")))
      MappingTransform(casted, MappingPlan(
        exclude = Seq("c_nationkey"),
        rename = Map("c_mktsegment" -> "segment"),
        computed = Seq(
          ComputedColumn("seg3", "substr", Seq("segment", "0", "3")),
          ComputedColumn("label", "format", Seq("{c_custkey:08d}-{seg3}"))),
        order = Seq("label", "c_custkey", "c_name", "segment", "seg3", "c_acctbal")))
        // gate-safe emission: the catalog cast to decimal(18,4) is the
        // operator under test; the boundary type is double (see
        // SparkEntry determinism rules).
        .withColumn("c_acctbal", col("c_acctbal").cast("double"))
    }
  )

  val oracles: Map[String, String] = Map(
    "mig_scan_prune" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE date_trunc('day', ts) =
        |  (SELECT max(date_trunc('day', ts)) FROM events WHERE ts IS NOT NULL)
        |GROUP BY event_type""".stripMargin,

    "mig_projection_rename" ->
      "SELECT c_custkey AS id, c_name AS name, c_acctbal FROM customer",

    "mig_histogram" ->
      """SELECT bin, CAST(bin AS DOUBLE) * 25000 AS lo,
        |  COUNT(*) AS n
        |FROM (SELECT CAST(floor(o_totalprice / CAST(25000 AS DOUBLE))
        |    AS BIGINT) AS bin
        |  FROM orders WHERE o_totalprice IS NOT NULL)
        |GROUP BY bin""".stripMargin,

    "mig_top_values" ->
      """WITH u AS (
        |  SELECT 'lang' AS col_name, lang AS value FROM documents
        |  UNION ALL
        |  SELECT 'source', source FROM documents),
        |c AS (SELECT col_name, value, CAST(count(*) AS BIGINT) AS n
        |  FROM u WHERE value IS NOT NULL GROUP BY 1, 2)
        |SELECT col_name, value, n, rank FROM (
        |  SELECT col_name, value, n,
        |    CAST(row_number() OVER (PARTITION BY col_name
        |      ORDER BY n DESC, value ASC) AS INT) AS rank
        |  FROM c) WHERE rank <= 5""".stripMargin,

    "mig_compact" ->
      """SELECT user_id, value,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS last_us
        |FROM (SELECT user_id, value, ts,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE event_type = 'purchase')
        |WHERE rn = 1""".stripMargin,

    "mig_scd2" ->
      """WITH b AS (SELECT user_id AS k,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS vf,
        |    value AS attr, event_id AS tie
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT k, vf, attr,
        |    row_number() OVER (PARTITION BY k, vf ORDER BY tie DESC) AS rn
        |  FROM b),
        |d AS (SELECT k, vf, attr,
        |    lag(attr) OVER (PARTITION BY k ORDER BY vf) AS prev
        |  FROM v WHERE rn = 1),
        |sv AS (SELECT k, vf, attr FROM d WHERE prev IS NULL OR prev <> attr)
        |SELECT k AS user_id, attr AS value, vf AS valid_from_us,
        |  lead(vf) OVER (PARTITION BY k ORDER BY vf) AS valid_to_us,
        |  (lead(vf) OVER (PARTITION BY k ORDER BY vf) IS NULL) AS is_current
        |FROM sv""".stripMargin,

    "mig_merge_upsert" ->
      """WITH changes AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    o_totalprice * 2 AS o_totalprice, o_orderdate, o_orderpriority,
        |    FALSE AS _del
        |  FROM orders WHERE o_orderkey % 10 = 0 AND o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |    o_orderdate, o_orderpriority, TRUE
        |  FROM orders WHERE o_orderkey % 97 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
        |    o_totalprice, o_orderdate, o_orderpriority, FALSE
        |  FROM orders WHERE o_orderkey % 13 = 0)
        |SELECT
        |  CASE WHEN c.o_orderkey IS NOT NULL THEN c.o_orderkey
        |       ELSE b.o_orderkey END AS o_orderkey,
        |  CASE WHEN c.o_orderkey IS NOT NULL THEN c.o_custkey
        |       ELSE b.o_custkey END AS o_custkey,
        |  CASE WHEN c.o_orderkey IS NOT NULL THEN c.o_orderstatus
        |       ELSE b.o_orderstatus END AS o_orderstatus,
        |  CASE WHEN c.o_orderkey IS NOT NULL THEN c.o_totalprice
        |       ELSE b.o_totalprice END AS o_totalprice,
        |  CASE WHEN c.o_orderkey IS NOT NULL THEN c.o_orderdate
        |       ELSE b.o_orderdate END AS o_orderdate,
        |  CASE WHEN c.o_orderkey IS NOT NULL THEN c.o_orderpriority
        |       ELSE b.o_orderpriority END AS o_orderpriority
        |FROM orders b FULL OUTER JOIN changes c
        |  ON b.o_orderkey = c.o_orderkey
        |WHERE NOT COALESCE(c._del, FALSE)""".stripMargin,

    "mig_cast_pipeline" ->
      """SELECT CAST(doc_id AS VARCHAR) AS doc_id,
        |  CAST(n_chars AS BIGINT) AS n_chars, lang,
        |  TRY_CAST(source AS BIGINT) AS source_as_int
        |FROM documents""".stripMargin,

    "mig_temporal_cast" ->
      """SELECT doc_id,
        |  TRY_CAST(CASE WHEN doc_id % 4 = 0 THEN '2024-01-15 10:30:00'
        |                WHEN doc_id % 4 = 1 THEN '2024-13-45 99:99:99'
        |                WHEN doc_id % 4 = 2 THEN '2024-02-01'
        |                ELSE 'not a date' END AS TIMESTAMP) AS ts_out
        |FROM documents""".stripMargin,

    "mig_cast_errors" ->
      """WITH d AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'x' || CAST(doc_id AS VARCHAR)
        |         ELSE CAST(doc_id AS VARCHAR) END AS raw
        |  FROM documents)
        |SELECT CAST(count(*) AS BIGINT) AS n_failures, min(raw) AS sample_min
        |FROM d WHERE raw IS NOT NULL AND TRY_CAST(raw AS INTEGER) IS NULL""".stripMargin,

    "mig_db_defaults" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0 THEN 'unknown' ELSE lang END AS lang2,
        |  CASE WHEN doc_id % 7 = 0 THEN 42 ELSE doc_id END AS num2
        |FROM documents""".stripMargin,

    "mig_bool_parse" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN lower(trim(l_returnflag)) IN ('true','1','yes','y') THEN TRUE
        |       WHEN lower(trim(l_returnflag)) IN ('false','0','no','n','') THEN FALSE
        |       ELSE NULL END AS flag_bool
        |FROM lineitem""".stripMargin,

    "mig_null_tokens" ->
      """SELECT doc_id,
        |  CASE WHEN lower(source) IN ('nan','none','null','<na>') THEN NULL
        |       ELSE source END AS source_tok
        |FROM documents""".stripMargin,

    "mig_empty_null_default" ->
      """SELECT doc_id,
        |  COALESCE(CASE WHEN trim(lang) = '' THEN NULL ELSE lang END, 'und')
        |    AS lang_filled
        |FROM documents""".stripMargin,

    "mig_computed" ->
      """SELECT c_custkey, c_name,
        |  printf('%08d-%s', c_custkey, substring(c_mktsegment, 1, 3)) AS label,
        |  COALESCE(c_name,'') || '@' || COALESCE(c_mktsegment,'') AS who,
        |  upper(c_mktsegment) AS seg_code,
        |  substring(c_mktsegment, 1, 3) AS seg3,
        |  c_mktsegment AS segment
        |FROM customer""".stripMargin,

    "mig_null_counts" ->
      """SELECT COUNT(CASE WHEN value IS NULL THEN 1 END) AS n_value_nulls,
        |  COUNT(CASE WHEN props IS NULL THEN 1 END) AS n_props_nulls,
        |  COUNT(*) AS n_rows
        |FROM events""".stripMargin,

    "mig_skip_policy" ->
      "SELECT event_id, value FROM events WHERE value IS NOT NULL",

    "mig_latest_partition" ->
      "SELECT max(o_orderdate) AS latest_date, COUNT(*) AS n FROM orders",

    "mig_profile" ->
      """SELECT 'o_custkey' AS "column", 'bigint' AS type, COUNT(*) AS n_rows,
        |  COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS n_nulls,
        |  COUNT(DISTINCT o_custkey) AS n_distinct,
        |  CAST(min(o_custkey) AS VARCHAR) AS min_value,
        |  CAST(max(o_custkey) AS VARCHAR) AS max_value FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', 'string', COUNT(*),
        |  COUNT(CASE WHEN o_orderstatus IS NULL THEN 1 END),
        |  COUNT(DISTINCT o_orderstatus),
        |  CAST(min(o_orderstatus) AS VARCHAR),
        |  CAST(max(o_orderstatus) AS VARCHAR) FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', 'string', COUNT(*),
        |  COUNT(CASE WHEN o_orderpriority IS NULL THEN 1 END),
        |  COUNT(DISTINCT o_orderpriority),
        |  CAST(min(o_orderpriority) AS VARCHAR),
        |  CAST(max(o_orderpriority) AS VARCHAR) FROM orders""".stripMargin,

    "mig_inf_cleanup" ->
      """SELECT event_id,
        |  CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value_clean
        |FROM events""".stripMargin,

    "mig_migrate_e2e" ->
      """SELECT printf('%08d-%s', c_custkey, substring(c_mktsegment, 1, 3)) AS label,
        |  c_custkey, c_name, c_mktsegment AS segment,
        |  substring(c_mktsegment, 1, 3) AS seg3,
        |  CAST(CAST(c_acctbal AS DECIMAL(18,4)) AS DOUBLE) AS c_acctbal
        |FROM customer""".stripMargin
  )
}
