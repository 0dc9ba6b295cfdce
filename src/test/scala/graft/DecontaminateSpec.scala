package graft

import org.apache.spark.sql.functions._

import graft.operators.Decontaminate

/** Benchmark decontamination: overlap pairs against a naive
  * intersect-size baseline, planted-contamination detection, and the
  * clean() anti-join.
  */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, sf001, "documents")

  private def naivePairs(minShared: Int) = {
    // ground truth: per-pair distinct-shingle intersection size via
    // array_intersect on the full shingle arrays (all-pairs; test-only)
    val sh = docs.select($"doc_id",
      graft.functions.TextFunctions.wordShingles($"text", 3).as("sh"))
    val c = sh.filter($"doc_id" % 23 =!= 0)
      .select($"doc_id", $"sh".as("sh_c"))
    val b = sh.filter($"doc_id" % 23 === 0)
      .select($"doc_id".as("bench_id"), $"sh".as("sh_b"))
    c.crossJoin(b)
      .select($"doc_id", $"bench_id",
        size(array_intersect($"sh_c", $"sh_b")).cast("long").as("n_shared"))
      .filter($"n_shared" >= minShared)
  }

  test("overlapPairs matches the naive all-pairs intersection") {
    val fast = Decontaminate.overlapPairs(
        docs.filter($"doc_id" % 23 =!= 0), docs.filter($"doc_id" % 23 === 0),
        "doc_id", "text", n = 3, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val naive = naivePairs(2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(naive.nonEmpty)
    assert(fast == naive)
  }

  test("a planted contaminated doc is flagged and removed by clean()") {
    val benchRow = docs.filter($"doc_id" % 23 === 0).limit(1)
    // plant: a training doc that embeds a benchmark doc verbatim
    val planted = benchRow.select(
      lit(999999L).as("doc_id"),
      concat(lit("prefix words here "), $"text").as("text"),
      $"lang", $"source", $"n_chars")
    val corpus = docs.filter($"doc_id" % 23 =!= 0).unionByName(planted)
    val bench = docs.filter($"doc_id" % 23 === 0)

    val flagged = Decontaminate.overlapPairs(corpus, bench,
      "doc_id", "text", n = 3, minShared = 5)
    assert(flagged.filter($"doc_id" === 999999L).count() >= 1)

    val cleaned = Decontaminate.clean(corpus, bench,
      "doc_id", "text", n = 3, minShared = 5)
    assert(cleaned.filter($"doc_id" === 999999L).count() == 0)
    // clean() only removes flagged docs, nothing else
    val nFlagged = flagged.select("doc_id").distinct().count()
    assert(cleaned.count() == corpus.count() - nFlagged)
  }

  test("disjoint vocabularies: zero flags, clean() is identity") {
    val corpus = Seq((1L, "aa bb cc dd ee ff")).toDF("doc_id", "text")
    val bench = Seq((2L, "xx yy zz ww vv uu")).toDF("doc_id", "text")
    assert(Decontaminate.overlapPairs(corpus, bench, "doc_id", "text",
      minShared = 1).count() == 0)
    assert(Decontaminate.clean(corpus, bench, "doc_id", "text").count() == 1)
  }

  test("small benchmark side ends up broadcast (AQE-chosen, not hinted)") {
    val df = Decontaminate.overlapPairs(
      docs.filter($"doc_id" % 23 =!= 0), docs.filter($"doc_id" % 23 === 0),
      "doc_id", "text")
    df.collect() // AQE finalizes plans per stage only after execution
    assert(df.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
  }
}
