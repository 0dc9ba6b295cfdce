package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Build/probe split for the on-disk PPJoin n-gram index (BASELINE.md
  * round-10): writeNgramIndex once per corpus version vs
  * probeNgramIndex per arriving batch — the number that justifies the
  * persisted index is the probe wall, not the combined one-shot wall.
  *
  * Usage: NgramIndexBench <sfStyleDir> [outPath]
  * Split: doc_id % M == 0 arrives, the rest is the corpus (the
  * dedup_incremental_* gate convention at M=10). M comes from
  * SPARK_GRAFT_BATCH_MOD (default 10): the ingest decade holds the
  * BATCH size fixed (~50k docs) while the corpus grows a decade, so
  * M=100 at the 5M-doc point probes with the same-sized arrival as
  * M=10 at 500k — the per-arrival cost curve, not a %-of-corpus one.
  * SPARK_GRAFT_LAYOUTS (default "plain,bucketed") selects layouts: at
  * 5M docs the plain-parquet probe re-shuffles the index (~the
  * symmetric PPJoin's wide stage — the measured single-box wall), so
  * the decade's top point runs "bucketed" only, and says so.
  * Shuffle width is Tune-derived from the corpus bytes (the
  * DocScaleBench policy; SPARK_GRAFT_SHUFFLE_PARTITIONS overrides).
  */
object NgramIndexBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft_ngram_idx").toString
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val batchMod = sys.env.getOrElse("SPARK_GRAFT_BATCH_MOD", "10").toInt
    val layouts = sys.env.getOrElse("SPARK_GRAFT_LAYOUTS", "plain,bucketed")
      .split(",").map(_.trim).toSet
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", {
      val docBytes = graft.operators.Tune.parquetBytes(s"$dir/documents.parquet")
      if (docBytes > 0)
        graft.operators.Tune.shufflePartitions(docBytes,
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

    val d = Tables(spark, dir, "documents")
    val corpus = d.filter(pmod($"doc_id", lit(batchMod)) =!= 0)
    val batch = d.filter(pmod($"doc_id", lit(batchMod)) === 0)
    val nC = corpus.count(); val nB = batch.count()
    System.err.println(s"[ngramidx] corpus=$nC batch=$nB " +
      s"shuffle.partitions=$shuffleParts layouts=$layouts")

    if (layouts("plain")) {
      // `reuse` third arg: probe an existing index from a fresh JVM
      // (the real arrival shape — the builder JVM is long gone when a
      // batch lands)
      val reuse = args.length > 2 && args(2) == "reuse" &&
        new java.io.File(s"$out/df").exists()
      val buildWall = if (reuse) 0.0 else {
        val t0 = System.nanoTime()
        graft.operators.Dedup.writeNgramIndex(corpus, out, "doc_id", "text",
          n = 3, threshold = 0.5)
        (System.nanoTime() - t0) / 1e9
      }

      def probeOnce(): (Double, Long) = {
        val t = System.nanoTime()
        val r = graft.operators.Dedup.probeNgramIndex(spark, out, batch,
          "doc_id", "text", n = 3, threshold = 0.5)
        val n = r.count()
        ((System.nanoTime() - t) / 1e9, n)
      }
      val (cold, rows) = probeOnce()
      val (w1, _) = probeOnce()
      val (w2, _) = probeOnce()
      val idxBytes = graft.operators.Tune.parquetBytes(out)
      println(f"""{"dir":"$dir","layout":"parquet","n_corpus":$nC,"n_batch":$nB,"build_sec":$buildWall%.1f,"probe_cold_sec":$cold%.1f,"probe_warm_sec":${math.min(w1, w2)}%.1f,"pairs":$rows,"index_bytes":$idxBytes}""")
    }

    if (layouts("bucketed")) {
      // the bucketed-catalog layout: bucketing survives the write/read
      // boundary, so probes never re-shuffle the index side. `reuse`
      // skips the build when the catalog tables already exist (pair
      // with SPARK_GRAFT_KEEP_TABLES=1 on the builder run) — that is
      // the fresh-JVM arrival shape for THIS layout.
      // attachNgramIndexBucketed re-creates the catalog entries over
      // the surviving warehouse data (in-memory catalog = entries die
      // with the builder JVM; a persistent metastore would keep them)
      // bucket count: the operator's corpus-derived default
      // (Tune.scaledBuckets). The printed value is read back from the
      // layout's OWN sidecar after the build/attach — the writer floors
      // at spark defaultParallelism, not at SPARK_GRAFT_CPUS, so
      // recomputing here could mis-declare the layout actually built.
      // filesPerBucket default 1: the measured round-12 A/B at 5M docs
      // (BASELINE.md) prices m=3 at −19% build wall (write tasks no
      // longer funneled below the Tune shuffle width) but +100% cold
      // probe (3× the files opened per probed bucket) — for a
      // build-once / probe-many layout the probe side wins, so the
      // multi-file build stays an explicit knob for build-bound
      // deployments.
      val fpb = sys.env.get("SPARK_GRAFT_FILES_PER_BUCKET").map(_.toInt)
        .getOrElse(1)
      val reuseBkt = args.length > 2 && args(2) == "reuse" &&
        graft.operators.Dedup.attachNgramIndexBucketed(spark,
          "bench_ngram_idx")
      val buildBkt = if (reuseBkt) 0.0 else {
        val tb = System.nanoTime()
        graft.operators.Dedup.writeNgramIndexBucketed(corpus,
          "bench_ngram_idx", "doc_id", "text", n = 3, threshold = 0.5,
          filesPerBucket = fpb, knownCount = nC)
        (System.nanoTime() - tb) / 1e9
      }
      def probeBkt(): (Double, Long) = {
        val t = System.nanoTime()
        val r = graft.operators.Dedup.probeNgramIndexBucketed(spark,
          "bench_ngram_idx", batch, "doc_id", "text", n = 3,
          threshold = 0.5)
        val n = r.count()
        ((System.nanoTime() - t) / 1e9, n)
      }
      val (bCold, bRows) = probeBkt()
      val (bw1, _) = probeBkt()
      val (bw2, _) = probeBkt()
      val sidecarBuckets = graft.operators.Bucketed
        .bucketMeta(spark, "bench_ngram_idx_df").map(_._1).getOrElse(-1)
      val whBytes = Seq("df", "prefix", "shingles").map { s =>
        graft.operators.Tune.parquetBytes(new java.net.URI(
          spark.sessionState.catalog.defaultTablePath(
            spark.sessionState.sqlParser
              .parseTableIdentifier(s"bench_ngram_idx_$s")).toString)
          .getPath)
      }.sum
      println(f"""{"dir":"$dir","layout":"bucketed","n_corpus":$nC,"n_batch":$nB,"buckets":$sidecarBuckets,"files_per_bucket":$fpb,"build_sec":$buildBkt%.1f,"probe_cold_sec":$bCold%.1f,"probe_warm_sec":${math.min(bw1, bw2)}%.1f,"pairs":$bRows,"index_bytes":$whBytes}""")
    }

    // cleanup: repeated runs must not accumulate state. Drop the
    // bench's bucketed catalog tables (managed — DROP removes their
    // warehouse dirs), and when no explicit outPath was given, remove
    // the default temp index dir too. An explicit outPath is kept on
    // purpose — it's what the `reuse` mode probes from a fresh JVM;
    // SPARK_GRAFT_KEEP_TABLES=1 keeps the catalog tables for the same
    // reason (a later `reuse` run probes them without rebuilding).
    if (!sys.env.get("SPARK_GRAFT_KEEP_TABLES").contains("1"))
      Seq("df", "prefix", "shingles").foreach { s =>
        // dropBucketed: a reuse-attached table is external (CREATE …
        // LOCATION), where DROP TABLE alone leaves the data dir behind
        graft.operators.Bucketed.dropBucketed(spark, s"bench_ngram_idx_$s")
      }
    spark.stop()
    if (args.length <= 1) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(out))
    }
  }
}
