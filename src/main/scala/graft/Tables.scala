package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical access to the driver-generated testdata tables
  * (TESTDATA.md). One parquet file per table under the sf dir.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = read(spark, s"$sfDir/$name.parquet")
    if (name == "events") normalizeNanos(df) else df
  }

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 cannot read as
    * a timestamp. Read it as raw nanos (legacy conf) and truncate to
    * microseconds — integer `div`, not `/`, because nanos-since-epoch
    * exceeds double's 2^53 exact-integer range.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path)
  }

  def normalizeNanos(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None    => df
    }
  }
}
