package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling walls for the round-15 kernels (BASELINE.md decade rows):
  * the learned linear text scorer and the perceptual blockhash +
  * banded-Hamming pair path. Synthetic `spark.range` corpora — both
  * kernels are input-shaped (bytes/tokens in, integers out), so
  * synthesized rows measure exactly what a real corpus projection
  * would, with no disk staging (the PrefixScaleBench method).
  *
  * Modes:
  *  - `score`: [[graft.functions.TextExprs.linearTextScore]] over N
  *    ~50-token synthetic docs (4096-bucket uni+bigram model) —
  *    per-term kernel cost: md5 bucket hash + one array add.
  *  - `sig`: [[graft.operators.Multimodal.perceptualSig]] over N
  *    ~300-byte synthetic payloads — per-byte blockhash cost.
  *  - `train`: [[graft.operators.TextModel.trainLogOdds]] over N
  *    labeled docs — the trainer's one bucket-keyed count aggregate;
  *    the shuffle carries ≤ buckets×2 partial sums per task.
  *  - `pairs`: [[graft.operators.Multimodal.perceptualNearDupPairs]]
  *    over N UNIFORM pseudo-random signatures (xxhash64(id)) at 4 and
  *    2 bands — the banding/popcount machinery at best-case bucket
  *    balance. Uniform keys are the honest benchmark frame: real
  *    signature clustering moves cost onto bucket occupancy, which is
  *    exactly the documented bands-vs-corpus-size guidance (16-bit
  *    keys to ~2^16 assets, 32-bit keys beyond). An explicit 4th arg
  *    restricts the band set (at 100M rows the 4-band occupancy is
  *    ~1.5e11 candidates — the measured wall itself; only the 2-band
  *    line is run at that decade, per the operator's own guidance).
  *  - `probe`: the INCREMENTAL path at scale — build the persisted
  *    phash index over N uniform corpus signatures (2 bands, 32-bit
  *    keys), then probe it with a 20k-signature arrival batch (half
  *    planted dist-1 transcodes of corpus rows, half fresh). Build
  *    and probe are timed separately: the deployment split is
  *    build-once / probe-per-arrival.
  *
  * Usage: KernelScaleBench <rows> <score|sig|pairs|probe> [passes] [bands]
  */
object KernelScaleBench {
  def main(args: Array[String]): Unit = {
    val rows = args(0).toLong
    val mode = args(1)
    val passes = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~50 tokens/doc, vocabulary ~100k, token mix varies per doc (the
    // id-scaled multipliers decorrelate adjacent docs' term sets).
    // Modular-arithmetic form: (a·b) mod m = ((a mod m)(b mod m)) mod m
    // — identical token values to the direct product, but the
    // intermediate stays ≤ 100002² (the direct doc_id·(j·2654435761)
    // overflows BIGINT past ~70M rows)
    def docs = spark.range(1L, rows + 1L).toDF("doc_id")
      .withColumn("text", concat_ws(" ",
        (1 to 50).map(j =>
          format_string("w%d",
            pmod(pmod(col("doc_id"), lit(100003L)) *
              lit((j * 2654435761L) % 100003L), lit(100003L)))): _*))

    def run(): Unit = mode match {
      case "score" =>
        val w = Seq.tabulate(4096)(b =>
          ((b.toLong * 2654435761L) % 2000001L) - 1000000L)
        docs.select(col("doc_id"),
            graft.functions.TextExprs.linearTextScore(col("text"), w)
              .as("m"))
          .select(col("doc_id"), col("m.score_q"))
          .write.format("noop").mode("overwrite").save()
      case "sig" =>
        graft.operators.Multimodal.perceptualSig(
            docs.select(col("doc_id").as("media_id"),
              col("text").cast("binary").as("content")))
          .write.format("noop").mode("overwrite").save()
      case "train" =>
        // the trainer's ONE count aggregate at corpus scale: labels
        // alternate by id, term stream ~99 terms/doc — the shuffle
        // carries <= 4096 x 2 partial sums per task, never the terms
        graft.operators.TextModel.trainLogOdds(
            docs.withColumn("lab", pmod(col("doc_id"), lit(2)) === 0),
            "text", col("lab"), buckets = 4096)
          .write.format("noop").mode("overwrite").save()
      case other => sys.error(s"unknown mode: $other")
    }

    if (mode == "pairs") {
      val sigs = spark.range(1L, rows + 1L)
        .select(col("id").as("media_id"), xxhash64(col("id")).as("phash"))
      val bandSet =
        if (args.length > 3) Seq(args(3).toInt) else Seq(4, 2)
      bandSet.foreach { bands =>
        (1 to passes).foreach { p =>
          val t0 = System.nanoTime()
          val n = graft.operators.Multimodal
            .perceptualNearDupPairs(sigs, maxDist = 8, bands = bands)
            .count()
          val secs = (System.nanoTime() - t0) / 1e9
          println(f"""{"bench":"kernel_scale","mode":"pairs","bands":$bands,"rows":$rows,"pass":$p,"pairs":$n,"sec":$secs%.3f}""")
        }
      }
      spark.stop(); return
    }

    if (mode == "probe") {
      import graft.operators.Multimodal
      val table = "kernel_scale_phash_idx"
      val corpusSigs = spark.range(1L, rows + 1L)
        .select(col("id").as("media_id"), xxhash64(col("id")).as("phash"))
      // bucket width scaled to corpus band-row count (2 rows/sig)
      val buckets = math.max(32, (rows / 2000000L).toInt)
      graft.streaming.MediaIngestStream.dropPhashIndex(spark, table)
      val tb0 = System.nanoTime()
      Multimodal.writePhashIndexSigs(corpusSigs, table, buckets, bands = 2)
      val buildSecs = (System.nanoTime() - tb0) / 1e9
      println(f"""{"bench":"kernel_scale","mode":"probe_build","bands":2,"rows":$rows,"buckets":$buckets,"sec":$buildSecs%.3f}""")
      // 20k arrivals: even ids are dist-1 transcodes of corpus rows
      // (low bit flipped), odd ids fresh uniform signatures (hashed
      // from ABOVE the corpus id range, so they are corpus members
      // only by genuine 64-bit coincidence, never by construction)
      val batch = spark.range(1L, 20001L)
        .select((col("id") + lit(1000000000L)).as("media_id"),
          when(pmod(col("id"), lit(2)) === 0,
            xxhash64(pmod(col("id"), lit(rows)) + 1)
              .bitwiseXOR(lit(1L)))
            .otherwise(xxhash64(col("id") + lit(rows) + lit(7777777L)))
            .as("phash"))
      (1 to passes).foreach { p =>
        val t0 = System.nanoTime()
        val n = Multimodal.probePhashIndexSigs(spark, table, batch,
          maxDist = 8).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"""{"bench":"kernel_scale","mode":"probe","bands":2,"rows":$rows,"pass":$p,"hits":$n,"sec":$secs%.3f}""")
      }
      // the always-on-stream shape: a 200-arrival micro-batch fits the
      // key-literal cap, so the probe bucket-prunes the index scan
      // instead of reading the corpus
      val small = batch.limit(200)
      (1 to passes).foreach { p =>
        val t0 = System.nanoTime()
        val n = Multimodal.probePhashIndexSigs(spark, table, small,
          maxDist = 8).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"""{"bench":"kernel_scale","mode":"probe_small","bands":2,"rows":$rows,"pass":$p,"hits":$n,"sec":$secs%.3f}""")
      }
      graft.streaming.MediaIngestStream.dropPhashIndex(spark, table)
      spark.stop(); return
    }

    (1 to passes).foreach { p =>
      val t0 = System.nanoTime()
      run()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"bench":"kernel_scale","mode":"$mode","rows":$rows,"pass":$p,"sec":$secs%.3f}""")
    }
    spark.stop()
  }
}
