package graft

import org.apache.spark.sql.functions._

import graft.operators.{IndexVersions, IvfPqIndex, Similarity}
import graft.streaming.AnnIngestStream

/** Continuous maintenance of the persisted IVF-PQ index: per-batch
  * segment appends pinned to the batch id (exactly-once under retry),
  * the drift trail, the live-segment fold policy, and drift-triggered
  * rebuilds that subsume appended arrivals.
  */
class AnnIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  private def e = Tables(spark, sf001, "embeddings")
  private def queries =
    e.filter($"vec_id" < 10).select($"vec_id".as("qid"), $"embedding")

  private def bruteAll =
    Similarity.bruteForceTopK(e, queries, k = 5)
      .select("qid", "id", "rank").orderBy("qid", "rank")
      .collect().map(_.toSeq).toSeq

  private def probeAll(dir: String) =
    IvfPqIndex.probe(spark, dir, queries, rerankFrom = e, k = 5,
        nprobe = 8, rerank = 100000)
      .select("qid", "id", "rank").orderBy("qid", "rank")
      .collect().map(_.toSeq).toSeq

  /** Two arrival files (thirds of the corpus the base was built
    * without), promoted to the source dir with ordered mtimes so
    * maxFilesPerTrigger = 1 yields two deterministic micro-batches. */
  private def stageArrivals(srcDir: String): Unit = {
    val f1 = e.filter($"vec_id" % 6 === 0)
    val f2 = e.filter($"vec_id" % 6 === 3)
    f1.coalesce(1).write.parquet(s"$srcDir/f1")
    f2.coalesce(1).write.parquet(s"$srcDir/f2")
    def promote(sub: String, age: Long): Unit = {
      val part = new java.io.File(s"$srcDir/$sub").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(s"$srcDir/$sub.parquet")
      assert(part.renameTo(dst))
      assert(dst.setLastModified(System.currentTimeMillis() - age))
      new java.io.File(s"$srcDir/$sub").listFiles().foreach(_.delete())
      new java.io.File(s"$srcDir/$sub").delete(): Unit
    }
    promote("f1", 60000); promote("f2", 30000)
  }

  test("stream run appends each micro-batch as a pinned segment, logs " +
      "one drift row per batch, and the post-run probe equals brute " +
      "force over the full corpus") {
    val idx = tmpDir("annstream-idx")
    IvfPqIndex.write(e.filter($"vec_id" % 3 =!= 0), idx, dims = 64,
      nlist = 8)
    val srcDir = tmpDir("annstream-src")
    stageArrivals(srcDir)
    val driftDir = tmpDir("annstream-drift")
    AnnIngestStream.run(spark, srcDir, idx,
      checkpointDir = tmpDir("annstream-ckpt"), driftDir = driftDir)
    // two live segments (base had none, maxLiveSegments default leaves
    // them unfolded), numbered from the recorded base
    assert(IvfPqIndex.liveSegs(spark, idx) == Seq(1L, 2L))
    assert(probeAll(idx) == bruteAll,
      "post-stream probe must equal brute force over the full corpus")
    val log = AnnIngestStream.driftLog(spark, driftDir).get
      .orderBy($"batch_id").collect()
    assert(log.length == 2)
    log.foreach { r =>
      assert(r.getAs[Long]("n") > 0)
      val ratio = r.getAs[Double]("ratio")
      assert(ratio > 0.5 && ratio < 1.5,
        s"in-distribution arrivals must not flag drift: $ratio")
    }
    assert(log.map(_.getAs[Long]("seg")).toSeq == Seq(1L, 2L))
  }

  test("live-segment fold policy: maxLiveSegments = 0 folds after " +
      "every batch and the probe stays exact") {
    val idx = tmpDir("annstream-fold-idx")
    IvfPqIndex.write(e.filter($"vec_id" % 3 =!= 0), idx, dims = 64,
      nlist = 8)
    val srcDir = tmpDir("annstream-fold-src")
    stageArrivals(srcDir)
    AnnIngestStream.run(spark, srcDir, idx,
      checkpointDir = tmpDir("annstream-fold-ckpt"),
      driftDir = tmpDir("annstream-fold-drift"), maxLiveSegments = 0)
    assert(IvfPqIndex.liveSegs(spark, idx).isEmpty,
      "every batch must fold under maxLiveSegments = 0")
    assert(probeAll(idx) == bruteAll)
  }

  test("retries converge: replaying a batch under its pinned segment " +
      "number changes nothing, and a batch whose segment was already " +
      "folded is a no-op") {
    val idx = tmpDir("annstream-retry-idx")
    IvfPqIndex.write(e.filter($"vec_id" % 3 =!= 0), idx, dims = 64,
      nlist = 8)
    val driftDir = tmpDir("annstream-retry-drift")
    val b1 = e.filter($"vec_id" % 6 === 0)
    val b2 = e.filter($"vec_id" % 6 === 3)
    def replay(batch: org.apache.spark.sql.DataFrame, id: Long) =
      AnnIngestStream.applyBatch(spark, batch, id, idx, base = 0L,
        driftDir, "vec_id", "embedding", maxLiveSegments = 8,
        retrainRatio = Double.MaxValue, rebuildCorpus = None,
        nlist = 8, fitSamplePerCell = 256)
    replay(b1, 0L); replay(b2, 1L)
    val want = probeAll(idx)
    assert(want == bruteAll)
    // retry of a committed batch: same segment number, byte-identical
    // re-encode, set-union manifest — nothing moves
    replay(b1, 0L)
    assert(IvfPqIndex.liveSegs(spark, idx) == Seq(1L, 2L))
    assert(probeAll(idx) == want, "a replayed batch must change nothing")
    // fold, then retry a batch the fold subsumed: append refuses with
    // -2 (rows already probe-able from the base), probe unchanged
    IvfPqIndex.compact(spark, idx)
    replay(b2, 1L)
    assert(IvfPqIndex.liveSegs(spark, idx).isEmpty,
      "a retry of a folded batch must not resurrect its segment")
    assert(probeAll(idx) == want)
  }

  test("drift-triggered rebuild retrains from the supplied corpus and " +
      "subsumes appended arrivals — no double-counting") {
    val idx = tmpDir("annstream-rt-idx")
    IvfPqIndex.write(e.filter($"vec_id" % 3 =!= 0), idx, dims = 64,
      nlist = 8)
    val driftDir = tmpDir("annstream-rt-drift")
    val b1 = e.filter($"vec_id" % 3 === 0)
    // retrainRatio = -1 trips on ANY batch; the rebuild corpus is the
    // FULL table the arrivals land in (base ∪ batch) — the deployment
    // contract. Without segment subsumption the batch's rows would
    // probe from both the rebuilt base and the live segment, breaking
    // rank equality below.
    AnnIngestStream.applyBatch(spark, b1, 0L, idx, base = 0L,
      driftDir, "vec_id", "embedding", maxLiveSegments = 8,
      retrainRatio = -1.0, rebuildCorpus = Some(e),
      nlist = 8, fitSamplePerCell = 256)
    assert(IndexVersions.currentVersion(spark, idx).contains(2),
      "the tripped retrain must publish generation 2")
    assert(IvfPqIndex.liveSegs(spark, idx).isEmpty,
      "the rebuild must subsume the appended segment")
    assert(probeAll(idx) == bruteAll,
      "post-rebuild probe must equal brute force with no duplicates")
  }
}
