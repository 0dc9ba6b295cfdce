package graft

import org.apache.spark.sql.types._

/** Guards against GENERATOR DRIFT: the driver regenerates the testdata
  * parquet between rounds and has already changed physical types twice
  * (events.ts: TIMESTAMP(NANOS) → TIMESTAMP_NTZ micros). Every other
  * spec builds its frames in-memory with the types it expects, so a
  * drifted file schema sails through the suite and only explodes in the
  * driver's correctness gate — round 7 lost five queries that way.
  *
  * Three layers, cheapest first:
  *   1. the normalized-table contract (Tables() output types);
  *   2. ANALYSIS of every registered query against the real files —
  *      resolution/datatype errors (the entire round-7 failure class)
  *      surface here without executing anything;
  *   3. full execution of the five queries round 7 actually lost.
  */
class TestdataContractSpec extends SparkSpec {

  test("Tables() normalizes events.ts to instant TimestampType") {
    val schema = Tables(spark, sf001, "events").schema
    assert(schema("ts").dataType == TimestampType,
      s"events.ts must normalize to TimestampType, got ${schema("ts").dataType}")
    assert(schema("event_id").dataType == LongType)
    assert(schema("user_id").dataType == LongType)
    assert(schema("event_type").dataType == StringType)
    assert(schema("value").dataType == DoubleType)
  }

  test("Tables() leaves no TIMESTAMP_NTZ or raw-nanos column in any table") {
    // recursive: normalize() casts only TOP-LEVEL NTZ fields; if the
    // generator ever nests a timestamp inside a struct/array/map, the
    // unguarded unix_micros failure class the seam closes would re-open
    // silently — fail the suite loudly here instead
    def containsNtz(dt: DataType): Boolean = dt match {
      case TimestampNTZType    => true
      case s: StructType       => s.fields.exists(f => containsNtz(f.dataType))
      case a: ArrayType        => containsNtz(a.elementType)
      case m: MapType          => containsNtz(m.keyType) || containsNtz(m.valueType)
      case _                   => false
    }
    Tables.names.foreach { t =>
      val schema = Tables(spark, sf001, t).schema
      val ntz = schema.fields.filter(f => containsNtz(f.dataType))
      assert(ntz.isEmpty,
        s"$t carries NTZ (possibly nested) after normalize: " +
          ntz.map(_.name).mkString(","))
      assert(!(t == "events" && schema("ts").dataType == LongType),
        "events.ts left as raw nanos Long")
    }
  }

  test("documents/embeddings carry the pipeline-operator contract columns") {
    val d = Tables(spark, sf001, "documents").schema
    Seq("doc_id", "text", "lang", "source").foreach(c => assert(
      d.fieldNames.contains(c), s"documents missing $c"))
    val e = Tables(spark, sf001, "embeddings").schema
    assert(e.fieldNames.contains("embedding"))
    assert(e("embedding").dataType.isInstanceOf[ArrayType],
      s"embedding must be an array column, got ${e("embedding").dataType}")
  }

  test("documents carry >= 8 tokens — the span-gate oracle contract") {
    // the text_dup_spans / text_span_stats / text_span_scrub DuckDB
    // oracles replay only the k=8-WINDOW branch (the operators' short-
    // doc whole-span and blank-doc semantics diverge from the SQL by
    // design, spec-covered Spark-side). A generator drift to shorter
    // documents must fail HERE, loudly, not as a silent gate hash
    // mismatch — the round-7 NTZ lesson applied to token counts.
    import org.apache.spark.sql.functions._
    for (dir <- Seq(sf001, "/root/testdata/sf0.01")) {
      val short = Tables(spark, dir, "documents")
        .filter(size(split(trim(col("text")), "\\s+")) < 8 ||
          trim(col("text")) === "")
        .count()
      assert(short == 0,
        s"$dir: $short documents under 8 tokens — span-gate oracles " +
          "no longer match the operator semantics for them")
    }
  }

  test("every registered query ANALYZES against the real testdata schema") {
    // .schema forces analysis (resolution + type checking) without
    // running a job — exactly where unguarded unix_micros-on-NTZ died
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf001).schema; None }
      catch { case e: Throwable =>
        Some(name -> String.valueOf(e.getMessage).linesIterator.next()) }
    }
    assert(bad.isEmpty, s"queries failing analysis on real testdata:\n  " +
      bad.map { case (n, m) => s"$n: $m" }.mkString("\n  "))
  }

  test("sim_topk_pq oracle premise: rerank (2000) still covers the corpus") {
    // the PQ gate is a true oracle ONLY because its exact rerank
    // re-scores every candidate (rerank >= corpus ⇒ trained codebook
    // cannot affect the output). The generator has already drifted row
    // counts between rounds; if embeddings ever exceeds the gate's
    // rerank=2000 at a gate SF, the premise silently dies and oracle
    // mismatches would be misread as a code regression.
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val dir = s"/root/testdata/$sf"
      if (new java.io.File(s"$dir/embeddings.parquet").exists()) {
        val n = Tables(spark, dir, "embeddings").count()
        assert(n <= 2000L,
          s"$sf embeddings has $n rows > sim_topk_pq rerank=2000 — " +
            "raise the gate's rerank to keep the exact-rerank oracle premise")
      }
    }
  }

  test("the round-7 casualties execute end-to-end on the real files") {
    Seq("mig_compact", "mig_scd2", "q_gapfill", "stream_sessions",
        "stream_upsert").foreach { name =>
      val n = SparkEntry.queries(name)(spark, sf001).count()
      assert(n > 0, s"$name returned no rows at sf0.001")
    }
  }
}
