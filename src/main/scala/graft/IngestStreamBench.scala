package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Wall-clock for the CONTINUOUS ingest streams
  * ([[graft.streaming.IngestStream]] text-side,
  * [[graft.streaming.EmbedIngestStream]] vector-side) against their
  * persisted indexes — the number that prices the always-on arrival
  * pipeline: per-micro-batch wall through the REAL Structured
  * Streaming engine (file source → foreachBatch → per-batch-dir sink),
  * next to the same batches replayed sequentially WITHOUT the engine
  * (applyBatch calls back-to-back). The difference is the engine's
  * bookkeeping (checkpointing, file tracking, listing the accepted
  * dirs), which must stay noise next to the probe cost itself.
  *
  * Usage: IngestStreamBench <sfStyleDir> [text|embed|both|serialize]
  *   SPARK_GRAFT_BATCH_MOD  (default 10): id % MOD == 0 arrives, the
  *                          rest is the frozen corpus (gate convention)
  *   SPARK_GRAFT_N_BATCHES  (default 4): arrival micro-batches
  * Emits one JSON line per mode.
  *
  * `serialize` is the SERIALIZATION leg of the loop at scale: base
  * corpus → [[graft.operators.Shards.writeShards]], then the arrival
  * stream through the REAL engine (file source, one file per
  * micro-batch, foreachBatch → appendShards), a MID-STREAM
  * [[graft.operators.Shards.compactShards]] between the two arrival
  * waves (the second wave resumes from the same checkpoint — stream
  * recovery across a compaction), and a full corpus ≡ manifest
  * integrity audit at the end (doc/mass totals, raw read vs
  * manifest-directed read, per-shard disk aggregate row-for-row equal
  * to the manifest). The dedup stages are priced by `text` mode;
  * composing them ahead of the appender is the gate/spec-covered
  * loop — this phase isolates what serialization itself costs and
  * proves its durability story under real micro-batches.
  */
object IngestStreamBench {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = if (args.length > 1) args(1) else "both"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val batchMod = sys.env.getOrElse("SPARK_GRAFT_BATCH_MOD", "10").toInt
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_N_BATCHES", "4").toInt
    // size the shuffle from the LARGER table a mode can touch: an
    // embed-only run over a big embeddings table must not inherit a
    // width derived from a small documents file (and vice versa)
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", {
      val docBytes =
        if (mode == "embed") 0L
        else graft.operators.Tune.parquetBytes(s"$dir/documents.parquet")
      val embBytes =
        if (mode == "text") 0L
        else graft.operators.Tune.parquetBytes(s"$dir/embeddings.parquet")
      val inBytes = math.max(docBytes, embBytes)
      if (inBytes > 0)
        graft.operators.Tune.shufflePartitions(inBytes,
          graft.operators.Tune.PpjoinShuffleExpansion,
          floor = cpus.toInt).toString
      else cpus
    })
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold",
        String.valueOf(64L * 1024 * 1024))
      .config("spark.io.compression.codec", "zstd")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_ingest_stream_bench").toString
    System.err.println(s"[ingeststream] scratch=$scratch " +
      s"shuffle.partitions=$shuffleParts mod=$batchMod batches=$nBatches")

    /** Write each arrival slice as ONE parquet file with ascending mod
      * times, so the file stream consumes them in slice order. */
    def stageArrivals(src: org.apache.spark.sql.DataFrame, idCol: String,
        subdir: String): String = {
      val srcDir = s"$scratch/$subdir"
      (0 until nBatches).foreach { i =>
        val slice = src.filter(
          pmod(col(idCol).divide(batchMod).cast("long"), lit(nBatches)) === i)
        slice.coalesce(1).write.parquet(s"$srcDir/b$i")
        val part = new java.io.File(s"$srcDir/b$i").listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(s"$srcDir/b$i.parquet")
        require(part.renameTo(dst), s"rename failed for $subdir/b$i")
        require(dst.setLastModified(
          System.currentTimeMillis() - (nBatches - i) * 60000L))
        new java.io.File(s"$srcDir/b$i").listFiles().foreach(_.delete())
        new java.io.File(s"$srcDir/b$i").delete(): Unit
      }
      srcDir
    }

    /** Per-batch triggerExecution durations from the engine itself.
      * Progress events arrive asynchronously on the listener bus, so
      * [[drain]] polls until the expected batch count has landed (or a
      * bounded timeout) BEFORE the listener is removed — without it the
      * final micro-batch's row can be lost to the remove race.
      */
    class BatchTimes extends org.apache.spark.sql.streaming.StreamingQueryListener {
      private val times = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        val d = e.progress.durationMs.getOrDefault("triggerExecution", -1L)
        if (e.progress.numInputRows > 0)
          times.synchronized { times += ((e.progress.batchId, d)): Unit }
      }
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      def drain(expected: Int, timeoutMs: Long = 10000L): Seq[(Long, Long)] = {
        val deadline = System.nanoTime() + timeoutMs * 1000000L
        while (times.synchronized(times.size) < expected &&
            System.nanoTime() < deadline) Thread.sleep(50)
        times.synchronized(times.toList)
      }
    }

    def fmtBatches(ts: Seq[(Long, Long)]): String =
      ts.sortBy(_._1).map(t => f"${t._2 / 1e3}%.1f").mkString("[", ",", "]")

    if (mode == "text" || mode == "both") {
      val d = Tables(spark, dir, "documents")
      val corpus = d.filter(pmod($"doc_id", lit(batchMod)) =!= 0)
      val arrivals = d.filter(pmod($"doc_id", lit(batchMod)) === 0)
      val nC = corpus.count(); val nA = arrivals.count()
      val idxPrefix = "ingest_stream_bench_idx"
      val tb0 = System.nanoTime()
      graft.operators.Dedup.writeNgramIndexBucketed(corpus, idxPrefix,
        "doc_id", "text", n = 3, threshold = 0.5, buckets = cpus.toInt)
      val buildSec = (System.nanoTime() - tb0) / 1e9
      val srcDir = stageArrivals(arrivals, "doc_id", "text_src")
      val lst = new BatchTimes
      spark.streams.addListener(lst)
      val t0 = System.nanoTime()
      graft.streaming.IngestStream.run(spark, srcDir, idxPrefix,
        indexBuckets = cpus.toInt, outDir = s"$scratch/text_out",
        checkpointDir = s"$scratch/text_ckpt")
      val streamSec = (System.nanoTime() - t0) / 1e9
      val batchTimes = lst.drain(nBatches)
      spark.streams.removeListener(lst)
      val accepted = graft.streaming.IngestStream
        .accepted(spark, s"$scratch/text_out").map(_.count()).getOrElse(0L)
      // sequential replay of the same slices, no streaming engine
      val t1 = System.nanoTime()
      var acc: Option[org.apache.spark.sql.DataFrame] = None
      (0 until nBatches).foreach { i =>
        val b = spark.read.parquet(s"$srcDir/b$i.parquet")
        val r = graft.streaming.IngestStream.applyBatch(spark, b, acc,
          idxPrefix, "doc_id", "text", 3, 0.5)
        r.write.mode("overwrite").parquet(s"$scratch/text_replay/b$i")
        val dirs = (0 to i).map(j => s"$scratch/text_replay/b$j")
        acc = Some(spark.read.parquet(dirs: _*))
      }
      val replaySec = (System.nanoTime() - t1) / 1e9
      println(f"""{"mode":"text","n_corpus":$nC,"n_arrivals":$nA,"n_batches":$nBatches,"index_build_sec":$buildSec%.1f,"stream_wall_sec":$streamSec%.1f,"replay_wall_sec":$replaySec%.1f,"accepted":$accepted,"batch_sec":${fmtBatches(batchTimes)}}""")

      // A/B the compaction COUNT JOB (VERDICT r12 #7): auto bucket
      // sizing re-counts corpus ∪ archive (a full text scan);
      // corpusCount makes it a parquet-footer count over the archive
      // only. Same accepted set staged per run, explicit newIndexPrefix
      // so every build is input-identical; variants ALTERNATE and the
      // min of two reps is reported (first-run page-cache bias measured
      // 10s at the 450k decade — larger than the count job itself, so
      // single-shot ordering lies in either direction). The count job
      // being removed is also timed alone.
      def stageOut(sub: String): String = {
        val o = s"$scratch/$sub"
        spark.read.parquet(
            (0 until nBatches).map(j => s"$scratch/text_replay/b$j"): _*)
          .write.mode("overwrite").parquet(s"$o/batch=0")
        o
      }
      def oneCompact(tag: String, known: Boolean, rep: Int): Double = {
        val o = stageOut(s"cmp_${tag}_$rep")
        val t = System.nanoTime()
        graft.streaming.IngestStream.compact(spark, corpus, idxPrefix, o,
          newIndexPrefix = s"ingest_bench_cmp_$tag",
          corpusCount = if (known) nC else -1L)
        (System.nanoTime() - t) / 1e9
      }
      val walls = Seq(("auto", false, 0), ("known", true, 0),
        ("auto", false, 1), ("known", true, 1))
        .map { case (tag, k, rep) => (tag, oneCompact(tag, k, rep)) }
      val cmpAutoSec = walls.filter(_._1 == "auto").map(_._2).min
      val cmpKnownSec = walls.filter(_._1 == "known").map(_._2).min
      val tCnt = System.nanoTime()
      val unionRows = corpus.select($"doc_id", $"text")
        .unionByName(spark.read.parquet(
          (0 until nBatches).map(j => s"$scratch/text_replay/b$j"): _*)
          .select($"doc_id", $"text"))
        .count()
      val countJobSec = (System.nanoTime() - tCnt) / 1e9
      println(f"""{"mode":"text_compact","n_corpus":$nC,"accepted":$accepted,"union_rows":$unionRows,"compact_knowncount_sec":$cmpKnownSec%.1f,"compact_autocount_sec":$cmpAutoSec%.1f,"count_job_sec":$countJobSec%.1f}""")
      Seq("ingest_bench_cmp_known", "ingest_bench_cmp_auto").foreach { p =>
        Seq("df", "prefix", "shingles").foreach { s =>
          graft.operators.Bucketed.dropBucketed(spark, s"${p}_$s")
        }
      }
      Seq("df", "prefix", "shingles").foreach { s =>
        graft.operators.Bucketed.dropBucketed(spark, s"${idxPrefix}_$s")
      }
    }

    if (mode == "media") {
      // the MEDIA arrival pipeline at scale: phash-index the corpus,
      // stream arrivals (fresh assets + 'Z'-transcodes of corpus
      // members — the perturbation class the perceptual stages own)
      // through the REAL engine, replay the same slices sequentially,
      // then price the compaction fold into index generation 2
      import graft.operators.Multimodal
      import graft.streaming.MediaIngestStream
      val d = Tables(spark, dir, "documents")
      val media = d.select($"doc_id".as("media_id"),
        $"text".cast("binary").as("content"))
      val corpus = media.filter(pmod($"media_id", lit(batchMod)) =!= 0)
      val arrivals = media.filter(pmod($"media_id", lit(batchMod)) === 0)
        .unionByName(d.filter(pmod($"doc_id", lit(batchMod)) === 1)
          .select(($"doc_id" + lit(10000000000L)).as("media_id"),
            concat(lit("Z"), expr("substring(text, 2)"))
              .cast("binary").as("content")))
      val nC = corpus.count(); val nA = arrivals.count()
      val table = "ingest_stream_bench_phash"
      val buckets = math.max(cpus.toInt, (nC / 2000000L).toInt)
      MediaIngestStream.dropPhashIndex(spark, table)
      val tb0 = System.nanoTime()
      Multimodal.writePhashIndex(corpus, table, buckets, bands = 4)
      val buildSec = (System.nanoTime() - tb0) / 1e9
      val srcDir = stageArrivals(arrivals, "media_id", "media_src")
      val lst = new BatchTimes
      spark.streams.addListener(lst)
      val t0 = System.nanoTime()
      MediaIngestStream.run(spark, srcDir, table,
        outDir = s"$scratch/media_out",
        checkpointDir = s"$scratch/media_ckpt")
      val streamSec = (System.nanoTime() - t0) / 1e9
      val batchTimes = lst.drain(nBatches)
      spark.streams.removeListener(lst)
      val accepted = MediaIngestStream
        .accepted(spark, s"$scratch/media_out").map(_.count()).getOrElse(0L)
      // sequential replay of the same slices, no streaming engine
      val t1 = System.nanoTime()
      var acc: Option[org.apache.spark.sql.DataFrame] = None
      (0 until nBatches).foreach { i =>
        val b = spark.read.parquet(s"$srcDir/b$i.parquet")
        val r = MediaIngestStream.applyBatch(spark, b, acc, table)
        r.write.mode("overwrite").parquet(s"$scratch/media_replay/b$i")
        val dirs = (0 to i).map(j => s"$scratch/media_replay/b$j")
        acc = Some(spark.read.parquet(dirs: _*))
      }
      val replaySec = (System.nanoTime() - t1) / 1e9
      val replayAccepted = acc.map(_.count()).getOrElse(0L)
      require(replayAccepted == accepted,
        s"engine ($accepted) and replay ($replayAccepted) accepted " +
          "sets diverged")
      // compaction: fold the accepted media into index GENERATION 2
      val tc0 = System.nanoTime()
      MediaIngestStream.compact(spark, corpus, table,
        s"$scratch/media_out")
      val compactSec = (System.nanoTime() - tc0) / 1e9
      val gen = graft.operators.IndexVersions.currentVersion(spark,
        Multimodal.phashIndexRoot(spark, table)).getOrElse(0)
      // a post-compaction probe hits the NEW generation: a transcode
      // of a folded acceptance must be caught by the index alone
      val tp0 = System.nanoTime()
      val postHits = Multimodal.probePhashIndex(spark, table,
        spark.read.parquet(
            (0 until nBatches).map(j => s"$scratch/media_replay/b$j"): _*)
          .limit(200)
          .select(($"media_id" + lit(20000000000L)).as("media_id"),
            $"content"),
        maxDist = 8).count()
      val postProbeSec = (System.nanoTime() - tp0) / 1e9
      MediaIngestStream.dropPhashIndex(spark, table)
      println(f"""{"mode":"media","n_corpus":$nC,"n_arrivals":$nA,"n_batches":$nBatches,"buckets":$buckets,"index_build_sec":$buildSec%.1f,"stream_wall_sec":$streamSec%.1f,"replay_wall_sec":$replaySec%.1f,"accepted":$accepted,"compact_sec":$compactSec%.1f,"post_compact_generation":$gen,"post_probe_hits":$postHits,"post_probe_sec":$postProbeSec%.1f,"batch_sec":${fmtBatches(batchTimes)}}""")
    }

    if (mode == "serialize") {
      import graft.operators.Shards
      val d = Tables(spark, dir, "documents").select($"doc_id", $"text")
      val corpus = d.filter(pmod($"doc_id", lit(batchMod)) =!= 0)
      val arrivals = d.filter(pmod($"doc_id", lit(batchMod)) === 0)
      val nC = corpus.count(); val nA = arrivals.count()
      val expMass = d.agg(sum(length($"text"))).head().getLong(0)
      // ~200 target shards over the FULL corpus at any scale; arrival
      // batches are ~1/(MOD·N_BATCHES) of that mass, so each appended
      // wave leaves the under-target tail compaction exists to fold
      val shardMass = math.max(1L, expMass / 200L)
      val shardDir = s"$scratch/ser_shards"
      val tb = System.nanoTime()
      Shards.writeShards(corpus, shardDir, "doc_id", length($"text"),
        shardMass, knownCount = nC): Unit
      val baseSec = (System.nanoTime() - tb) / 1e9

      // stage arrival slices as single files; wave 2 lands in the SAME
      // source dir after wave 1's run, so the resumed stream (same
      // checkpoint) picks up exactly the new files
      val srcDir = s"$scratch/ser_src"
      def stageSlices(ids: Range): Unit = ids.foreach { i =>
        val slice = arrivals.filter(
          pmod($"doc_id".divide(batchMod).cast("long"), lit(nBatches)) === i)
        slice.coalesce(1).write.parquet(s"$srcDir/b$i")
        val part = new java.io.File(s"$srcDir/b$i").listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(s"$srcDir/b$i.parquet")
        require(part.renameTo(dst), s"rename failed for ser b$i")
        require(dst.setLastModified(
          System.currentTimeMillis() - (nBatches - i) * 60000L))
        new java.io.File(s"$srcDir/b$i").listFiles().foreach(_.delete())
        new java.io.File(s"$srcDir/b$i").delete(): Unit
      }
      val docSchema = d.schema
      def runWave(expectBatches: Int): (Double, Seq[(Long, Long)]) = {
        val lst = new BatchTimes
        spark.streams.addListener(lst)
        val t = System.nanoTime()
        val q = spark.readStream.schema(docSchema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir)
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            // fixed bucket count: a micro-batch must not pay a sizing
            // count job per trigger (batches are small by construction)
            Shards.appendShards(b, shardDir, "doc_id",
              length(col("text")), shardMass, buckets = cpus.toInt): Unit
          }
          .option("checkpointLocation", s"$scratch/ser_ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val wall = (System.nanoTime() - t) / 1e9
        val times = lst.drain(expectBatches)
        spark.streams.removeListener(lst)
        (wall, times)
      }

      val half = math.max(1, nBatches / 2)
      stageSlices(0 until half)
      val (w1, t1s) = runWave(half)
      val tailBefore = Shards.readManifest(spark, shardDir)
        .filter($"mass" < shardMass / 2).count()
      val tc = System.nanoTime()
      Shards.compactShards(spark, shardDir, "doc_id", shardMass,
        buckets = cpus.toInt): Unit
      val compactSec = (System.nanoTime() - tc) / 1e9
      val tailAfter = Shards.readManifest(spark, shardDir)
        .filter($"mass" < shardMass / 2).count()
      stageSlices(half until nBatches)
      val (w2, t2s) = runWave(nBatches - half)

      // integrity audit: manifest ≡ corpus, three independent reads
      val man = Shards.readManifest(spark, shardDir)
        .localCheckpoint(true)
      val tots = man.agg(sum($"docs").as("d"), sum($"mass").as("m"))
        .head()
      val (manDocs, manMass) = (tots.getLong(0), tots.getLong(1))
      val rawDocs = spark.read.parquet(shardDir).count()
      val corpusDocs = Shards.readCorpus(spark, shardDir).count()
      val diskAgg = spark.read.parquet(shardDir)
        .groupBy($"shard".cast("long").as("shard"))
        .agg(count(lit(1)).as("docs"), sum($"doc_mass").as("mass"))
      val manMismatch = diskAgg.exceptAll(man).count() +
        man.exceptAll(diskAgg).count()
      val ok = manDocs == nC + nA && manMass == expMass &&
        rawDocs == manDocs && corpusDocs == manDocs && manMismatch == 0L
      println(f"""{"mode":"serialize","n_corpus":$nC,"n_arrivals":$nA,"n_batches":$nBatches,"shard_mass":$shardMass,"base_write_sec":$baseSec%.1f,"wave1_sec":$w1%.1f,"compact_sec":$compactSec%.1f,"wave2_sec":$w2%.1f,"batch_sec":${fmtBatches(t1s ++ t2s)},"small_tail_before_compact":$tailBefore,"small_tail_after_compact":$tailAfter,"manifest_docs":$manDocs,"manifest_mass":$manMass,"raw_read_docs":$rawDocs,"manifest_read_docs":$corpusDocs,"per_shard_mismatch_rows":$manMismatch,"integrity_ok":$ok}""")
    }

    if (mode == "embed" || mode == "both") {
      val e = Tables(spark, dir, "embeddings")
      val dims = e.select(size($"embedding")).head().getInt(0)
      val corpus = e.filter(pmod($"vec_id", lit(batchMod)) =!= 0)
      val arrivals = e.filter(pmod($"vec_id", lit(batchMod)) === 0)
      val nC = corpus.count(); val nA = arrivals.count()
      val idxPath = s"$scratch/sign_idx"
      val tb0 = System.nanoTime()
      graft.operators.Similarity.writeSignIndex(corpus, idxPath, dims,
        numPlanes = 0, seed = 42L, knownCount = nC)
      val buildSec = (System.nanoTime() - tb0) / 1e9
      val srcDir = stageArrivals(arrivals, "vec_id", "embed_src")
      val lst = new BatchTimes
      spark.streams.addListener(lst)
      val t0 = System.nanoTime()
      graft.streaming.EmbedIngestStream.run(spark, srcDir, idxPath, dims,
        outDir = s"$scratch/embed_out", checkpointDir = s"$scratch/embed_ckpt")
      val streamSec = (System.nanoTime() - t0) / 1e9
      val batchTimes = lst.drain(nBatches)
      spark.streams.removeListener(lst)
      val accepted = graft.streaming.EmbedIngestStream
        .accepted(spark, s"$scratch/embed_out").map(_.count()).getOrElse(0L)
      val t1 = System.nanoTime()
      var acc: Option[org.apache.spark.sql.DataFrame] = None
      (0 until nBatches).foreach { i =>
        val b = spark.read.parquet(s"$srcDir/b$i.parquet")
        val r = graft.streaming.EmbedIngestStream.applyBatch(spark, b, acc,
          idxPath, "vec_id", "embedding", dims, 0.4, 1, 42L)
        r.write.mode("overwrite").parquet(s"$scratch/embed_replay/b$i")
        val dirs = (0 to i).map(j => s"$scratch/embed_replay/b$j")
        acc = Some(spark.read.parquet(dirs: _*))
      }
      val replaySec = (System.nanoTime() - t1) / 1e9
      println(f"""{"mode":"embed","n_corpus":$nC,"n_arrivals":$nA,"n_batches":$nBatches,"index_build_sec":$buildSec%.1f,"stream_wall_sec":$streamSec%.1f,"replay_wall_sec":$replaySec%.1f,"accepted":$accepted,"batch_sec":${fmtBatches(batchTimes)}}""")
    }

    // ANN-index maintenance stream: base IVF-PQ index over the corpus,
    // arrivals folded in per micro-batch as pinned frozen-codebook
    // segments through the REAL streaming engine; post-stream freshness
    // probe (every arrival twin must surface its own id at rank 1 —
    // exact-rerank guarantee), then the pure fold and the re-probe.
    if (mode == "ann") {
      val I = graft.operators.IvfPqIndex
      val emb = Tables(spark, dir, "embeddings")
      val corpus = emb.filter(pmod($"vec_id", lit(batchMod)) =!= 0)
      val arrivals = emb.filter(pmod($"vec_id", lit(batchMod)) === 0)
      val nC = corpus.count(); val nA = arrivals.count()
      val idx = s"$scratch/ann_idx"
      val tb = System.nanoTime()
      I.write(corpus, idx, dims = 64, nlist = 0, knownCount = nC)
      val buildSec = (System.nanoTime() - tb) / 1e9
      val srcDir = stageArrivals(arrivals, "vec_id", "ann_src")
      val lst = new BatchTimes
      spark.streams.addListener(lst)
      val t0 = System.nanoTime()
      graft.streaming.AnnIngestStream.run(spark, srcDir, idx,
        checkpointDir = s"$scratch/ann_ckpt",
        driftDir = s"$scratch/ann_drift")
      val streamSec = (System.nanoTime() - t0) / 1e9
      val batchTimes = lst.drain(nBatches)
      spark.streams.removeListener(lst)
      val liveSegs = I.liveSegs(spark, idx).size
      val driftRows = graft.streaming.AnnIngestStream
        .driftLog(spark, s"$scratch/ann_drift").map(_.count()).getOrElse(0L)
      // freshness: 10 arrival twins re-id'd as probes — each must find
      // its streamed-in original at rank 1 (cosine 1 through the exact
      // rerank), proving the appended segments serve
      val probes = arrivals.orderBy($"vec_id").limit(10)
        .select(($"vec_id" + 900000000L).as("qid"), $"embedding")
        .localCheckpoint(true)
      def probeOnce(): (Double, Long) = {
        val t = System.nanoTime()
        val hits = I.probe(spark, idx, probes, rerankFrom = emb,
            k = 1, nprobe = 8, rerank = 50)
          .filter($"id" === $"qid" - 900000000L).count()
        ((System.nanoTime() - t) / 1e9, hits)
      }
      val (probeSec, hits) = probeOnce()
      val tc = System.nanoTime()
      I.compact(spark, idx)
      val compactSec = (System.nanoTime() - tc) / 1e9
      val (postProbeSec, postHits) = probeOnce()
      println(f"""{"mode":"ann","n_corpus":$nC,"n_arrivals":$nA,"n_batches":$nBatches,"index_build_sec":$buildSec%.1f,"stream_wall_sec":$streamSec%.1f,"live_segments":$liveSegs,"drift_rows":$driftRows,"probe_hits":$hits,"probe_sec":$probeSec%.1f,"compact_sec":$compactSec%.1f,"post_probe_hits":$postHits,"post_probe_sec":$postProbeSec%.1f,"batch_sec":${fmtBatches(batchTimes)}}""")
    }

    spark.stop()
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(scratch))
  }
}
