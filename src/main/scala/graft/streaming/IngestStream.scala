package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Dedup

/** Continuous near-duplicate ingest — the persisted-index arrival
  * pipeline (BASELINE.md round-10/11 ingest decades) as ONE streaming
  * query instead of a hand-scheduled batch job. Each micro-batch of
  * arriving documents is
  *
  *  1. exact-deduped WITHIN the batch (fingerprint hash-agg, min-id
  *     keeper — a crawler emitting the same page twice in one batch),
  *  2. probed against the PERSISTED bucketed n-gram index
  *     ([[graft.operators.Dedup.probeNgramIndexBucketed]]) — the
  *     write-once/probe-many corpus side, Exchange-free on the index —
  *     and
  *  3. near-dup probed against everything this stream has ALREADY
  *     ACCEPTED (the accumulating output), so a duplicate arriving two
  *     batches after its original is caught even though the frozen
  *     corpus index has neither.
  *
  * Survivors land in `outDir/batch=<id>/`, written with overwrite so a
  * foreachBatch retry after a crash rewrites the same directory —
  * append-exactly-once without a transaction log. The accepted-set
  * probe (step 3) reads the accumulated output; it grows with accepted
  * arrivals only, which at a 100 TB deployment is orders of magnitude
  * smaller than the corpus the index covers, and the operator it feeds
  * is the asymmetric PPJoin whose per-arrival cost is batch-sized.
  * Periodic re-index folds the accepted set into the next corpus
  * version, resetting step 3 to empty — the compaction cadence is the
  * deployment's knob, not this operator's.
  *
  * Within-batch NEAR-dups (two different-id, similar-text docs in one
  * arrival) are intentionally not resolved here: that is the symmetric
  * [[graft.operators.Dedup.ngramJaccardPairs]] on a batch-sized frame,
  * composable before this sink when the arrival source needs it.
  */
object IngestStream {

  /** Rows of `batch` that survive the within-batch exact pass: the
    * min-id keeper per fingerprint (the [[Dedup.exact]] contract). */
  private def exactWithinBatch(batch: DataFrame, idCol: String,
      textCol: String): DataFrame =
    batch.join(
      Dedup.exact(batch, idCol, textCol).select(col("keep_id").as(idCol)),
      Seq(idCol))

  /** One micro-batch through the three dedup stages. Factored out of
    * the stream so tests (and backfills) can replay it batch-exactly.
    * `accepted` is the already-ingested set (None for the first batch
    * of a fresh output dir).
    */
  private[graft] def applyBatch(spark: SparkSession, batch: DataFrame,
      accepted: Option[DataFrame], indexTablePrefix: String,
      idCol: String, textCol: String, n: Int,
      threshold: Double): DataFrame = {
    val b1 = exactWithinBatch(batch, idCol, textCol)
    val dupVsCorpus = Dedup.probeNgramIndexBucketed(spark,
        indexTablePrefix, b1, idCol, textCol, n, threshold)
      .select(col("id_batch").as(idCol)).distinct()
    val b2 = b1.join(dupVsCorpus, Seq(idCol), "left_anti")
    accepted match {
      case None => b2
      case Some(acc) =>
        val dupVsAccepted = Dedup.ngramJaccardPairsAcross(acc, b2,
            idCol, textCol, n, threshold)
          .select(col("id_batch").as(idCol)).distinct()
        b2.join(dupVsAccepted, Seq(idCol), "left_anti")
    }
  }

  /** Run the ingest stream to completion over whatever is in `srcDir`
    * (AvailableNow — the drain-the-backlog trigger; swap for a
    * processing-time trigger in an always-on deployment). The bucketed
    * index tables are attached on entry when this session doesn't know
    * them yet ([[Dedup.attachNgramIndexBucketed]] — `indexBuckets` must
    * match the build). Restart-safe: checkpoint tracks consumed files,
    * per-batch overwrite makes replays idempotent.
    */
  def run(spark: SparkSession, srcDir: String, indexTablePrefix: String,
      indexBuckets: Int, outDir: String, checkpointDir: String,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 3,
      threshold: Double = 0.5, maxFilesPerTrigger: Int = 1): Unit = {
    require(
      Dedup.attachNgramIndexBucketed(spark, indexTablePrefix, indexBuckets),
      s"no bucketed n-gram index under table prefix $indexTablePrefix")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val schema = graft.Tables.read(spark, srcDir).schema
    val stream = graft.Tables.normalize(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(srcDir))
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val acceptedDirs = Option(new java.io.File(outDir).listFiles())
          .getOrElse(Array.empty)
          .filter(f => f.isDirectory && f.getName.startsWith("batch="))
          // a retry of batch N must not probe N's own half-written
          // output: only strictly-older batches count as accepted
          .filter(_.getName.stripPrefix("batch=").toLong < batchId)
          .map(_.getAbsolutePath)
        val accepted =
          if (acceptedDirs.isEmpty) None
          else Some(spark.read.parquet(acceptedDirs.toIndexedSeq: _*))
        applyBatch(spark, batch, accepted, indexTablePrefix,
          idCol, textCol, n, threshold)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Everything the stream has accepted so far. */
  def accepted(spark: SparkSession, outDir: String): Option[DataFrame] = {
    val dirs = Option(new java.io.File(outDir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(_.getAbsolutePath)
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs.toIndexedSeq: _*))
  }
}
