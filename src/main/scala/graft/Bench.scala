package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query against
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line.
  *
  * Methodology: one untimed warmup pass (JVM JIT + codegen + parquet
  * footer caches), then one timed pass per query. `value` is the timed
  * pass total; `cold_total_sec` records the warmup pass for reference.
  *
  * Materialization is a `noop`-format write, NOT `count()`: count lets
  * Catalyst prune every column not needed for cardinality — a window or
  * per-row-score projection vanishes from the measured plan entirely
  * (q_asof_join "cost" 0.28s under count vs 0.9s with its payload
  * actually computed). The noop sink evaluates every output column.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // 64m: the ~15MB ngram prefix self-join sits at the default 10MB
      // AQE broadcast edge and flaps between broadcast and SMJ plans
      // (measured 2.6s vs 10s run-to-run); plenty of driver room here
      .config("spark.sql.autoBroadcastJoinThreshold", String.valueOf(64L * 1024 * 1024))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val failed = scala.collection.mutable.LinkedHashSet[String]()
    def once(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      // drop blocks left by previous queries (localCheckpoint RDDs from
      // iterative operators are pinned until explicitly unpersisted —
      // by the timed pass they'd tax storage memory: dedup_components
      // measured 7.0s in the full sweep vs 3.6s isolated before this)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      // pay previous queries' GC debt before the clock starts — without
      // this, allocation-heavy early queries tax whichever query GC
      // happens to land on (observed 2-3x per-query swings run-to-run)
      System.gc()
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      } catch {
        // record, don't hide: a swallowed failure shows up as a
        // misleading millisecond "timing" (a broken query once looked
        // like the fastest in the sweep)
        case _: Throwable => failed += name
      }
      (System.nanoTime() - t0) / 1e9
    }

    // profiling aid: SPARK_GRAFT_ONLY=q1,q2 restricts the run (the
    // driver never sets it, so the contract output is unchanged)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val cold = ordered.map { case (name, fn) => once(name, fn) }.sum
    // two timed passes, min per query: host-level noise on this VM swings
    // single measurements ±30%; min-of-2 is the standard damping
    val results = ordered.map { case (name, fn) =>
      name -> math.min(once(name, fn), once(name, fn))
    }

    // ms precision: the full-Double rendering of 80+ queries pushed the
    // JSON line past the driver's output tail buffer (BENCH_r03 captured
    // the line with its head cut off -> parse failure). ~1.9KB now.
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson =
      if (failed.isEmpty) ""
      else failed.map("\"" + _ + "\"")
        .mkString(""","failed":[""", ",", "]")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"cold_total_sec":${fmt(cold)}$failedJson,"sf":"$sfDir"}""")
    // compact totals-only line LAST: the driver's capture keeps the
    // TAIL of the output, and the full per-query line above (~2.5KB at
    // 109 queries) has overflowed that buffer head-first two rounds
    // running (BENCH_r04/r05 "parsed": null — the leading {"metric"...
    // was cut, making the line unparseable). This line is ~120 bytes,
    // sits at the very end of the stream, and parses standalone.
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","warm_total_sec":${fmt(total)},"cold_total_sec":${fmt(cold)},"n_queries":${results.size},"n_failed":${failed.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
