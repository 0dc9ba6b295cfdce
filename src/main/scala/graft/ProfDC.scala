package graft

// Phase-level profiling main for the optimization rounds — NOT part of
// the driver contract (no JSON line, not a registered query). Kept so
// the per-phase numbers in OPTIMIZATION_r16.md are reproducible and the
// next optimization round can re-measure the same lifecycle.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfDC {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[phase] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold",
        String.valueOf(64L * 1024 * 1024))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def runOnce(tag: String): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      val d = Tables(spark, dir, "documents")
      val m10 = pmod($"doc_id", lit(10))
      val c0 = d.filter(m10 =!= 0 && m10 =!= 5).select($"doc_id", $"text")
      val b1 = d.filter(m10 === 5)
      val b2 = d.filter(m10 === 0)
      val prefix = "graft_ngram_bkt_profiletest_cmp"
      val outDir = "/tmp/graft_dc_profile_out"
      println(s"== $tag ==")
      val T0 = System.nanoTime()
      t("writeNgramIndexBucketed") {
        operators.Dedup.writeNgramIndexBucketed(c0, prefix, "doc_id",
          "text", n = 3, threshold = 0.5)
      }
      val a1 = t("applyBatch b1") {
        streaming.IngestStream.applyBatch(spark, b1, None, prefix,
          "doc_id", "text", 3, 0.5)
      }
      t("write accepted") {
        a1.select($"doc_id", $"text").write.mode("overwrite")
          .parquet(s"$outDir/batch=0")
      }
      t("compact") {
        streaming.IngestStream.compact(spark, c0, prefix, outDir)
      }
      val res = t("applyBatch b2 + checkpoint") {
        streaming.IngestStream.applyBatch(spark, b2, None, prefix,
            "doc_id", "text", 3, 0.5)
          .select($"doc_id").localCheckpoint(true)
      }
      t("noop write") { res.write.format("noop").mode("overwrite").save() }
      Seq("df", "prefix", "shingles").foreach { sfx =>
        spark.sql(s"DROP TABLE IF EXISTS ${prefix}_$sfx"): Unit
      }
      println(f"[phase] TOTAL $tag ${(System.nanoTime() - T0) / 1e9}%8.3f s")
    }

    runOnce("cold")
    runOnce("warm1")
    runOnce("warm2")
    spark.stop()
  }
}
