package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Benchmark decontamination: flag training documents that share word
  * n-grams with an evaluation/benchmark set (the standard train-set
  * hygiene step for LLM corpora — n-gram collision decontamination as
  * published for GPT-3 (Brown et al. 2020 §C) and PaLM; public method).
  *
  * Scale shape (100 TB corpus, ~10^4..10^6 benchmark docs): the
  * benchmark side is small relative to the corpus, so the planner
  * broadcasts its exploded distinct-shingle table (AQE decides from
  * the ACTUAL size — no forced hint, because at the 10^6-doc end the
  * exploded table is 10^8+ rows and a forced broadcast would abort
  * the job rather than degrade to a shuffle join) — the corpus side
  * then streams map-side with no shuffle of corpus text or shingles.
  * Only actual collisions (rare: contamination is the exception) reach
  * the (doc, bench_doc) count shuffle, which carries two longs per hit.
  * Shingles per document are distinct ([[TextFunctions.wordShingles]]),
  * so a plain COUNT per pair IS the distinct-shared-shingle count — no
  * count_distinct expand needed.
  */
object Decontaminate {

  /** (doc_id, bench_id, n_shared, frac) for every corpus×benchmark
    * document pair sharing at least `minShared` distinct word n-grams.
    * `frac` = n_shared / |benchmark doc's shingles| — the containment
    * ratio practitioners threshold on ("X% of the eval item appears in
    * this training doc"); a single integer division, engine-exact.
    */
  def overlapPairs(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String,
      n: Int = 5, minShared: Int = 5): DataFrame = {
    val c = corpus.select(col(idCol).as("doc_id"),
      explode(TextFunctions.wordShingles(col(textCol), n)).as("sh"))
    val bSh = bench.select(col(idCol).as("bench_id"),
      TextFunctions.wordShingles(col(textCol), n).as("shs"))
    val b = bSh.select(col("bench_id"), size(col("shs")).as("bench_n_sh"),
      explode(col("shs")).as("sh"))
    c.join(b, "sh")
      .groupBy(col("doc_id"), col("bench_id"), col("bench_n_sh"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("doc_id"), col("bench_id"), col("n_shared"),
        (col("n_shared").cast("double") / col("bench_n_sh").cast("double"))
          .as("frac"))
  }

  /** Corpus rows with every contaminated document removed: anti-join on
    * the distinct flagged ids. The flagged set is small (collisions
    * only), so Spark plans a broadcast anti-join — the corpus never
    * shuffles.
    */
  def clean(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String,
      n: Int = 5, minShared: Int = 5): DataFrame = {
    val flagged = overlapPairs(corpus, bench, idCol, textCol, n, minShared)
      .select(col("doc_id")).distinct()
    corpus.join(flagged,
      corpus(idCol) === flagged("doc_id"), "left_anti")
  }
}
