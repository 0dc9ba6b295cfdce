package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale harness for the prefix-sum serialization primitives
  * (BASELINE.md decade tables): measures [[graft.operators.Sampling
  * .prefixMass]]'s bucketed composition against the naive global-window
  * formulation it replaces, plus the two operators built on it
  * (systematic sampling, shard assignment), over a synthetic
  * `spark.range` corpus — the operator's cost is row-count-shaped
  * (integers in, integers out), so range rows measure exactly what a
  * 100 TB doc-id/token-count projection would, with no disk staging.
  *
  * Modes: `composed` (prefixMass), `naive` (single global window — the
  * plan a driver-side `sum OVER ()` produces; one task sorts
  * everything), `sample` (systematicSample, step such that ~1% mass
  * survives), `shards` (shardByMass assignment only — the write is
  * parquet-bound, not operator-bound).
  *
  * Usage: PrefixScaleBench <rows> <mode> [passes]. Output: one JSON
  * line per pass; the decade tables record cross-pass min.
  */
object PrefixScaleBench {
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
    import org.apache.spark.sql.expressions.Window

    def corpus = spark.range(1L, rows + 1L).toDF("doc_id")
      .withColumn("m", pmod(col("doc_id"), lit(997L)) + lit(20L))

    def run() = mode match {
      case "composed" =>
        graft.operators.Sampling.prefixMass(corpus, "doc_id", col("m"),
          knownCount = rows)
      case "naive" =>
        corpus.withColumn("cum_mass", sum(col("m")).over(
          Window.orderBy(graft.operators.Sampling.idScore(col("doc_id")),
              col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      case "sample" =>
        // avg mass ~518 → step 51800 keeps ~1% of the mass
        graft.operators.Sampling.systematicSample(corpus, "doc_id",
          col("m"), step = 51800L, knownCount = rows)
      case "shards" =>
        // ~520 MB of mass per shard at the 100M point
        graft.operators.Shards.shardByMass(corpus, "doc_id", col("m"),
          shardMass = 100L * 1000 * 1000, knownCount = rows)
      case other => sys.error(s"unknown mode: $other")
    }

    // "write" measures the END-TO-END serialization: assignment + the
    // real parquet shard layout + manifest (disk-bound; the separation
    // from `shards` isolates operator cost from I/O cost)
    if (mode == "write") {
      (1 to passes).foreach { p =>
        val out = java.nio.file.Files
          .createTempDirectory("prefix-write").toString
        val t0 = System.nanoTime()
        graft.operators.Shards.writeShards(corpus, out, "doc_id",
          col("m"), shardMass = 100L * 1000 * 1000,
          knownCount = rows): Unit
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"""{"bench":"prefix_scale","mode":"write","rows":$rows,"pass":$p,"sec":$secs%.3f}""")
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(out))
      }
      spark.stop(); return
    }

    (1 to passes).foreach { p =>
      val t0 = System.nanoTime()
      run().write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"bench":"prefix_scale","mode":"$mode","rows":$rows,"pass":$p,"sec":$secs%.3f}""")
    }
    spark.stop()
  }
}
