package graft

// Phase-level profiling main for the optimization rounds — NOT part of
// the driver contract (no JSON line, not a registered query). Kept so
// the per-phase numbers in OPTIMIZATION_r16.md are reproducible and the
// next optimization round can re-measure the same lifecycle.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfIvf {
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
      val e = Tables(spark, dir, "embeddings")
      val queries = e.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding")
      val path = "/tmp/graft_prof_ivf_seg"
      val I = operators.IvfIndex
      println(s"== $tag ==")
      val T0 = System.nanoTime()
      t("write base (2/3)") {
        I.write(e.filter($"vec_id" % 3 =!= 0), path, dims = 64, nlist = 8)
      }
      t("append seg1") {
        I.appendVectors(spark, path, e.filter($"vec_id" % 6 === 0))
      }
      t("append seg2") {
        I.appendVectors(spark, path, e.filter($"vec_id" % 6 === 3))
      }
      val onSegs = t("probe on segs + ckpt") {
        I.probe(spark, path, queries, k = 5, nprobe = 8)
          .select(lit("segs").as("phase"), $"qid", $"id", $"rank")
          .localCheckpoint(true)
      }
      t("compact") { I.compact(spark, path, nlist = 8) }
      val res = t("probe on base") {
        I.probe(spark, path, queries, k = 5, nprobe = 8)
          .select(lit("base").as("phase"), $"qid", $"id", $"rank")
      }
      t("noop write") {
        onSegs.unionByName(res)
          .write.format("noop").mode("overwrite").save()
      }
      println(f"[phase] TOTAL $tag ${(System.nanoTime() - T0) / 1e9}%8.3f s")
    }

    runOnce("cold")
    runOnce("warm1")
    runOnce("warm2")
    spark.stop()
  }
}
