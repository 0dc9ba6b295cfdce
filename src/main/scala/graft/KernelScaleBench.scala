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
  *  - `pairs`: [[graft.operators.Multimodal.perceptualNearDupPairs]]
  *    over N UNIFORM pseudo-random signatures (xxhash64(id)) at 4 and
  *    2 bands — the banding/popcount machinery at best-case bucket
  *    balance. Uniform keys are the honest benchmark frame: real
  *    signature clustering moves cost onto bucket occupancy, which is
  *    exactly the documented bands-vs-corpus-size guidance (16-bit
  *    keys to ~2^16 assets, 32-bit keys beyond).
  *
  * Usage: KernelScaleBench <rows> <score|sig|pairs> [passes]
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
    // id-scaled multipliers decorrelate adjacent docs' term sets)
    def docs = spark.range(1L, rows + 1L).toDF("doc_id")
      .withColumn("text", concat_ws(" ",
        (1 to 50).map(j =>
          format_string("w%d", pmod(col("doc_id") * lit(j * 2654435761L),
            lit(100003L)))): _*))

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
      case other => sys.error(s"unknown mode: $other")
    }

    if (mode == "pairs") {
      val sigs = spark.range(1L, rows + 1L)
        .select(col("id").as("media_id"), xxhash64(col("id")).as("phash"))
      Seq(4, 2).foreach { bands =>
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

    (1 to passes).foreach { p =>
      val t0 = System.nanoTime()
      run()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"bench":"kernel_scale","mode":"$mode","rows":$rows,"pass":$p,"sec":$secs%.3f}""")
    }
    spark.stop()
  }
}
