package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling walls for the corpus-WIDE text operators (the per-document
  * kernels are embarrassingly parallel and priced in Bench; these four
  * shuffle corpus-wide state): boilerplate block removal, duplicated-
  * span discovery, per-doc contamination stats, and exact-substring
  * span removal. Run at two decades (sf0.1 = 5k docs, ×100 replica =
  * 500k docs) the walls must scale ~linearly in corpus tokens — every
  * shuffle row is bounded (a ≤c-token block / a k-token span / an id),
  * so there is no candidate-pair blowup to go quadratic.
  *
  * Usage: TextScaleBench <sfStyleDir>; emits one JSON line.
  */
object TextScaleBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // shuffle.partitions deliberately NOT set: the corpus-wide text
    // operators carry the Tune.ensureShufflePartitions guard, and this
    // bench exercises that library-default path at each decade
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = Tables(spark, dir, "documents")
    val n = d.count()

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    import graft.operators.TextQuality
    val (tBoiler, rBoiler) = time(
      TextQuality.removeFrequentBlocks(d, "doc_id", "text", 10, 3).count())
    val (tBoilerH, _) = time(
      TextQuality.removeFrequentBlocksHashed(d, "doc_id", "text", 10, 3)
        .count())
    val (tBoilerCdc, _) = time(
      TextQuality.removeFrequentBlocksCDC(d, "doc_id", "text",
        p = 10, maxTokens = 20, minFreq = 3).count())
    val (tSpans, rSpans) = time(
      TextQuality.duplicatedSpans(d, "text", 8, 2).count())
    val (tStats, rStats) = time(
      TextQuality.spanDupStats(d, "doc_id", "text", 8, 2)
        .filter(col("n_dup_spans") > 0).count())
    val (tScrub, rScrub) = time(
      TextQuality.removeDuplicatedSpans(d, "doc_id", "text", 8, 2)
        .agg(sum(col("n_removed"))).head().getLong(0))
    println(f"""{"dir":"$dir","n_docs":$n,"boilerplate_sec":$tBoiler%.1f,"boilerplate_hashed_sec":$tBoilerH%.1f,"boilerplate_cdc_sec":$tBoilerCdc%.1f,"boilerplate_rows":$rBoiler,"dup_spans_sec":$tSpans%.1f,"dup_spans":$rSpans,"span_stats_sec":$tStats%.1f,"docs_flagged":$rStats,"span_scrub_sec":$tScrub%.1f,"tokens_removed":$rScrub}""")
    spark.stop()
  }
}
