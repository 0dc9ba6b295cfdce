package graft

import org.apache.spark.sql.SparkSession

/** Single-query scale harness for the documents-family decade
  * measurements (BASELINE.md). Unlike [[Bench]] (cold + 2 warm passes
  * in one JVM), this runs `passes` passes of ONE registered query and
  * exits — at 5M documents a single PPJoin pass spills tens of GB of
  * shuffle, and three in-JVM passes accumulate spill files faster than
  * the async ContextCleaner reclaims them (observed: 62 GB blockmgr →
  * disk full). One JVM per pass bounds peak disk at one pass's spill;
  * cross-JVM min-of-N is then the decade table's number, applied
  * IDENTICALLY at every scale point so ratios stay comparable.
  *
  * Shuffle codec is zstd (vs the lz4 default): suffix-replicated text
  * shuffles compress ~2-3× tighter, which is what makes the 5M-doc
  * point fit the sandbox disk at all. Same codec at every point.
  *
  * Usage: DocScaleBench <dir> <queryName> [passes]
  */
object DocScaleBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val passes = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // At 5M docs the PPJoin shuffle is ~68 GB; over cpus=32 partitions
    // that is >2 GB per partition with 32 concurrent sort buffers — the
    // measured failure mode is a silently hung job (task thread dies,
    // scheduler waits forever). Scale-point runs size this so a shuffle
    // partition fits comfortably in memory (the same rule a 100 TB
    // deployment applies); AQE coalesces the excess at small points so
    // decade ratios stay comparable. Since round 10 the default is
    // DERIVED from the input bytes (graft.operators.Tune — the lesson
    // as engine policy); the env knob remains as an explicit override.
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", {
      // the expansion factor is calibrated for the documents family's
      // wide stages — derive only from documents.parquet; a dir without
      // one keeps the plain core-count default (summing unrelated
      // tables under a PPJoin factor would wildly over-provision)
      val docBytes = graft.operators.Tune.parquetBytes(s"$dir/documents.parquet")
      if (docBytes > 0) {
        val derived = graft.operators.Tune.shufflePartitions(
          docBytes, graft.operators.Tune.PpjoinShuffleExpansion,
          floor = cpus.toInt)
        System.err.println(s"[docscale] derived shuffle partitions: " +
          s"$derived (input $docBytes B x " +
          s"${graft.operators.Tune.PpjoinShuffleExpansion})")
        derived.toString
      } else cpus
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
    val fn = SparkEntry.queries(name)
    (1 to passes).foreach { p =>
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"query":"$name","dir":"$dir","pass":$p,"sec":$secs%.3f}""")
    }
    spark.stop()
  }
}
