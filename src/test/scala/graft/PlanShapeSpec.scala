package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.operators.{Dedup, Similarity}

/** Plan-shape regression guards for the headline join gates.
  *
  * BASELINE.md records the ngram prefix self-join flapping between
  * broadcast and SMJ plans at AQE's broadcast-threshold edge (2.6s vs
  * 10s run-to-run); these asserts pin the INTENDED physical shapes —
  * broadcast dims on the TPC-H joins, hash/merge equi-joins (never a
  * nested loop) on the LSH band joins — so a Spark upgrade, a stats
  * change, or a threshold default change cannot silently regress a
  * gate's plan while its output stays correct.
  *
  * AQE only finalizes join strategies at execution, so each query is
  * executed (noop sink) and the FINAL adaptive plan is asserted.
  */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embeddings = Tables(spark, sf001, "embeddings")

  private def finalPlan(df: DataFrame): String = {
    // collect() executes THIS Dataset's own QueryExecution — a noop
    // write would plan and run a SEPARATE QueryExecution, leaving
    // df.queryExecution's AdaptiveSparkPlanExec at its never-executed
    // INITIAL plan and the asserts blind to AQE's runtime rewrites
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    assert(df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.isFinalPlan
      case _                        => true
    }, "adaptive plan did not finalize — asserts would read the initial plan")
    plan.toString
  }

  test("TPC-H join gates: dims broadcast, no sort-merge or nested-loop " +
      "fallback at dim scale") {
    // q3/q5/q7 are the headline multi-join gates: every dimension side
    // fits the broadcast threshold by construction, so the intended
    // shape is broadcast joins + ONE shuffle for the fact aggregation.
    // An SMJ here means a dim stopped broadcasting (threshold/stats
    // regression); a nested loop means an equi-key stopped being one.
    for (q <- Seq("q3_join", "q5_join", "q7_volume")) {
      val plan = finalPlan(SparkEntry.queries(q)(spark, sf001))
      assert(plan.contains("BroadcastHashJoin"),
        s"$q: expected broadcast dim joins, got:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"$q: dim join degraded to sort-merge:\n$plan")
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"$q: join degraded to a product plan:\n$plan")
    }
  }

  test("ANN LSH gate: bucket probe stays a hash equi-join on the " +
      "signature, never a nested loop") {
    val queries = embeddings.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding")
    val df = Similarity.lshTopK(embeddings, queries, k = 5, dims = 64,
      numPlanes = 8, probeHamming = 2)
    val plan = finalPlan(df)
    assert(plan.contains("Join"), s"expected a candidate join:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"LSH bucket probe degraded to a product plan:\n$plan")
  }

  test("embedding near-dup LSH: band self-join stays a hash/merge " +
      "equi-join on (band, sig)") {
    val df = Dedup.embeddingNearDupPairs(embeddings, "vec_id", "embedding",
      dims = 64, threshold = 0.4, bands = 4, planesPerBand = 8)
    val plan = finalPlan(df)
    assert(plan.contains("Join"), s"expected a band self-join:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"band self-join degraded to a product plan:\n$plan")
  }

  test("embed-dedup GATE (dedup_embed_pairs): the measured plan is a " +
      "band equi-join — no cartesian product anywhere in the suite") {
    // round-8 verdict: the gate used to run the brute-force crossJoin
    // (the suite's ONLY cartesian product). It now runs the banded LSH
    // operator; this pins that — a fallback to the product plan would
    // pass correctness (the oracle replicates whatever banding computes)
    // while silently reverting the 100TB path.
    val plan = finalPlan(SparkEntry.queries("dedup_embed_pairs")(spark, sf001))
    assert(plan.contains("Join"), s"expected a band self-join:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"gate degraded to a product plan:\n$plan")
  }

  test("semantic dedup (sign quantizer): cell self-join stays an " +
      "equi-join on cell, never a product") {
    val df = Dedup.semanticPairsSig(embeddings, "vec_id", "embedding",
      dims = 64, threshold = 0.4, numPlanes = 3)
    val plan = finalPlan(df)
    assert(plan.contains("Join"), s"expected a cell self-join:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"cell self-join degraded to a product plan:\n$plan")
  }

  test("round-10 gates: asymmetric PPJoin and kNN join stay equi-join " +
      "plans — no product anywhere") {
    // dedup_incremental_near: batch-prefix x corpus-prefix on the
    // shingle hash; sim_knn_join: probe-bucket x corpus-bucket. Either
    // degrading to a nested loop would pass correctness (the oracles
    // replay whatever the candidates compute) while silently reverting
    // the continuous-ingest / kNN-graph cost shape.
    for (q <- Seq("dedup_incremental_near", "sim_knn_join")) {
      val plan = finalPlan(SparkEntry.queries(q)(spark, sf001))
      assert(plan.contains("Join"), s"$q: expected candidate joins:\n$plan")
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"$q: degraded to a product plan:\n$plan")
    }
    // q_bucketed_join pins its own zero-Exchange shape via the require()
    // inside the registered query — executing it here is the assert.
    SparkEntry.queries("q_bucketed_join")(spark, sf001).collect()
  }

  test("round-11 gate: IVF kNN join — cell candidates via hash equi-join; " +
      "the only product is the bounded centroid broadcast") {
    // knnJoinIvf's candidate generation must stay an equi-join on the
    // cell id (assigned x probeCells); the probe-side cell ranking
    // legitimately crossJoins a broadcast of the nlist centroids
    // (bounded: nlist <= 4096 rows), which plans as a broadcast
    // nested-loop — allowed. An unbroadcast Cartesian anywhere means
    // either the centroid frame stopped broadcasting or the cell join
    // lost its equi-key; both silently revert the nprobe/nlist cost
    // shape while correctness (exact at nprobe=nlist) keeps passing.
    val plan = finalPlan(SparkEntry.queries("sim_knn_join_ivf")(
      spark, sf001))
    assert(!plan.contains("CartesianProduct"),
      s"sim_knn_join_ivf: unbroadcast product:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"sim_knn_join_ivf: no equi-join found for cell candidates:\n$plan")
  }

  test("round-11 gate: bucketed-index ingest probe == recompute path, " +
      "row for row") {
    // dedup_incremental_bucketed persists the corpus PPJoin structures
    // as bucketed catalog tables and probes them; its contract is
    // byte-identical output to the in-memory asymmetric path (the
    // driver enforces this with a shared oracle text — this is the same
    // assert without the DuckDB round-trip, plus it exercises the
    // write/read/drop lifecycle inside a test session).
    val viaIndex = SparkEntry.queries("dedup_incremental_bucketed")(
      spark, sf001).collect().map(_.getLong(0)).toSet
    val recompute = SparkEntry.queries("dedup_incremental_near")(
      spark, sf001).collect().map(_.getLong(0)).toSet
    assert(viaIndex == recompute,
      s"bucketed probe diverged: ${viaIndex.diff(recompute).take(5)} / " +
        s"${recompute.diff(viaIndex).take(5)}")
    assert(viaIndex.nonEmpty)
  }

  test("round-11 gate: embedding ingest probe stays a bucket equi-join " +
      "— no product anywhere") {
    // dedup_incremental_embed: arriving-batch signatures x corpus sign
    // buckets (hamming<=1 multi-probe). Degrading to a nested loop is
    // batch x corpus = the quadratic the index exists to avoid.
    val plan = finalPlan(SparkEntry.queries("dedup_incremental_embed")(
      spark, sf001))
    assert(plan.contains("Join"), s"expected candidate join:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"degraded to a product plan:\n$plan")
  }

  test("change-log compaction family: ONE exchange end to end " +
      "(the single-shuffle contract the operator docs promise)") {
    // latestSnapshot / compactBatch are map-side-combinable hash aggs:
    // exactly one key exchange may appear. A second exchange means the
    // partial agg stopped combining (e.g. a non-deterministic column
    // crept into the grouping, or a window replaced the max_by).
    for (q <- Seq("mig_compact")) {
      val plan = finalPlan(SparkEntry.queries(q)(spark, sf001))
      val exchanges = "Exchange (hash|range)partitioning".r
        .findAllIn(plan).size
      assert(exchanges == 1,
        s"$q: expected exactly 1 shuffle, found $exchanges:\n$plan")
      assert(plan.contains("partial_max_by") || plan.contains("partial"),
        s"$q: map-side partial aggregation missing:\n$plan")
    }
    // scd2 adds the key-partitioned history windows on TOP of the
    // candidate agg, but they all reuse the one key partitioning: no
    // extra exchange beyond the first.
    val scd2 = finalPlan(SparkEntry.queries("mig_scd2")(spark, sf001))
    val scd2Ex = "Exchange (hash|range)partitioning".r
      .findAllIn(scd2).size
    assert(scd2Ex <= 2,
      s"mig_scd2: expected <=2 shuffles (agg + window sort), found $scd2Ex:\n$scd2")
  }

  test("round-11 span gates: dup-span table BROADCASTS back, no product") {
    // text_span_stats joins the exploded corpus spans against the
    // duplicated-span table. That table is vocabulary-like (only spans
    // crossing the minDocs bar) — the join must stay a broadcast; an
    // SMJ here shuffles the full exploded corpus a second time, and a
    // product plan is corpus x vocabulary.
    val plan = finalPlan(SparkEntry.queries("text_span_stats")(spark, sf001))
    assert(plan.contains("BroadcastHashJoin"),
      s"dup-span join-back stopped broadcasting:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"degraded to a product plan:\n$plan")
    // text_span_scrub: the dup table must broadcast onto the POSITIONAL
    // window explode (the non-distinct side never shuffles)
    val scrub = finalPlan(SparkEntry.queries("text_span_scrub")(spark, sf001))
    assert(scrub.contains("BroadcastHashJoin"),
      s"scrub candidate join stopped broadcasting:\n$scrub")
    assert(!scrub.contains("NestedLoop") && !scrub.contains("Cartesian"),
      s"scrub degraded to a product plan:\n$scrub")
    // boilerplate: the frequent-block set (string and hashed layouts)
    // must broadcast back onto the chunk explode — an SMJ re-shuffles
    // the exploded corpus; the frequency pass must be an AGGREGATE,
    // never a window partitioned by the (hot by definition) block key
    for (q <- Seq("text_boilerplate", "text_boilerplate_hashed",
        "text_boilerplate_cdc")) {
      val p = finalPlan(SparkEntry.queries(q)(spark, sf001))
      assert(p.contains("BroadcastHashJoin"),
        s"$q: frequent-set join stopped broadcasting:\n$p")
      assert(!p.contains("Window"),
        s"$q: hot-key window crept back into the frequency pass:\n$p")
      assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
        s"$q: product plan appeared:\n$p")
    }
    // dup-span discovery is a pure agg shape: no join anywhere
    val p = finalPlan(SparkEntry.queries("text_dup_spans")(spark, sf001))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"text_dup_spans: product plan appeared:\n$p")
  }

  test("round-16 kernels: trainer is ONE bucket-keyed exchange with " +
      "map-side partial aggregation; curation audit is ONE exchange " +
      "bounded by stages x groups") {
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, sf001, "documents")
    val tr = graft.operators.TextModel.trainLogOdds(docs, "text",
      col("lang") === "en", buckets = 4096)
    assert(graft.operators.Bucketed.countExchanges(tr) === 1,
      s"trainer must shuffle exactly once:\n${finalPlan(tr)}")
    val trPlan = finalPlan(tr)
    assert(trPlan.contains("partial_sum"),
      s"trainer lost map-side combine (the shuffle would carry terms, " +
        s"not bucket sums):\n$trPlan")
    val aud = graft.operators.Audit.curationAudit(
      docs.withColumn("k1", col("doc_id") % 2 === 0)
        .withColumn("k2", col("n_chars") > 100),
      "source", col("n_chars"),
      Seq("s1" -> col("k1"), "s2" -> col("k2")))
    assert(graft.operators.Bucketed.countExchanges(aud) === 1,
      s"audit must shuffle exactly once:\n${finalPlan(aud)}")
  }
}
