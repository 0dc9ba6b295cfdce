package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Size-targeted training-shard serialization: the last step of a
  * training-data assembly writes the curated corpus as shards of ~equal
  * token (or byte) mass plus a manifest describing each shard — what a
  * training loader actually consumes (epoch planning needs per-shard
  * token counts, not file sizes). The reference engine has no
  * serialization story; this is extension capability for the 100 TB
  * north star.
  *
  * Assignment is deterministic and storage-free: rows are laid out on
  * the integer mass line in the [[Sampling.idScore]] shuffle order
  * ([[Sampling.prefixMass]] — exact global prefix sums with NO global
  * sort), and a document belongs to the shard where its FIRST token
  * falls: `shard = (cum_mass − doc_mass) div shardMass`. Every shard
  * except the last then holds at least `shardMass` − (its last doc's
  * mass) and at most `shardMass` + (its overhanging doc's mass) of
  * mass — the standard greedy boundary, exact BIGINT arithmetic, and a
  * re-run reproduces the same shards bit-for-bit (resumable writes,
  * diffable manifests).
  *
  * Scale shape: the corpus crosses ONE wide shuffle (the prefix-sum
  * bucket partition) plus the shard repartition of the write; the
  * manifest is a ≤-#shards aggregate. No single-task sort anywhere
  * (the trap a naive `row_number`/`sum OVER ()` layout hits at 100 TB).
  */
object Shards {

  /** Per-row shard assignment (no files written). Output: input columns
    * + `doc_mass` (the row's own mass, BIGINT) + `cum_mass` (inclusive
    * prefix sum in serialization order) + `shard` (0-based).
    * `buckets`/`knownCount`/`epoch` as in [[Sampling.prefixMass]].
    */
  def shardByMass(df: DataFrame, idCol: String, mass: Column,
      shardMass: Long, buckets: Int = 0, knownCount: Long = -1L,
      epoch: Int = 0): DataFrame = {
    require(shardMass >= 1, s"shardMass must be >= 1: $shardMass")
    Sampling.prefixMass(df.withColumn("doc_mass", mass.cast("long")),
        idCol, col("doc_mass"), buckets, knownCount, epoch)
      .withColumn("shard",
        expr(s"(cum_mass - doc_mass) div ${shardMass}L"))
  }

  /** Materialize the shards: `outDir/shard=N/` parquet (rows carry
    * `doc_mass` and `cum_mass`; within-file order is serialization
    * order) plus a manifest at `outDir/_graft_manifest/` with one row
    * per shard — (shard, docs, mass) — computed by READING BACK the
    * written files, so the manifest describes what is actually on disk,
    * not what the plan intended. The underscore prefix hides the
    * manifest from `spark.read.parquet(outDir)`, which therefore loads
    * exactly the corpus. Returns the read-back manifest.
    *
    * The shard repartition hashes shard ids across tasks (each task
    * writes whole shards); with `shardMass` chosen for training-file
    * granularity the per-task row count is bounded by
    * shardMass/avg_doc_mass × shards-per-task, independent of corpus
    * size.
    */
  def writeShards(df: DataFrame, outDir: String, idCol: String,
      mass: Column, shardMass: Long, buckets: Int = 0,
      knownCount: Long = -1L, epoch: Int = 0): DataFrame = {
    val spark = df.sparkSession
    shardByMass(df, idCol, mass, shardMass, buckets, knownCount, epoch)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("cum_mass"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    spark.read.parquet(outDir)
      // partition-dir inference reads shard= back as INT; the manifest
      // contract is BIGINT like the assignment that produced it
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("docs"), sum(col("doc_mass")).as("mass"))
      .write.mode("overwrite").parquet(manifestDir(outDir))
    // snapshot (localCheckpoint): the returned frame must survive a
    // LATER append/rewrite replacing the manifest files under it
    readManifest(spark, outDir).localCheckpoint(true)
  }

  /** The persisted manifest of a [[writeShards]] layout. */
  def readManifest(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(manifestDir(outDir))

  /** APPEND a new batch of documents to an existing [[writeShards]]
    * layout — the serialization leg of an incremental pipeline (an
    * ingest stream keeps accepting documents; re-sharding the whole
    * corpus per arrival would be a full rewrite). The batch starts a
    * FRESH mass line in shards numbered from `maxShard + 1`, so
    * existing shard files are never touched (append-only layout, safe
    * under concurrent readers; dynamic partition overwrite writes only
    * the new dirs). Append-only also means REPLAYING a batch appends
    * it again under fresh shard numbers — feeding an appender exactly
    * once is the upstream's contract (the ingest stream's three dedup
    * stages are exactly that machinery). The manifest is extended with
    * the new shards' rows (computed by reading back ONLY the new,
    * partition-pruned dirs) and rewritten whole (≤ #shards rows).
    *
    * Assignment inside the batch is [[shardByMass]] verbatim, so batch
    * shards have the same size bounds and determinism as a fresh
    * layout's; only the shard NUMBERING is offset. Returns the updated
    * read-back manifest.
    */
  def appendShards(df: DataFrame, outDir: String, idCol: String,
      mass: Column, shardMass: Long, buckets: Int = 0,
      knownCount: Long = -1L, epoch: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val base = readManifest(spark, outDir)
      .agg(max(col("shard"))).head().getLong(0) + 1L
    val assigned = shardByMass(df, idCol, mass, shardMass, buckets,
        knownCount, epoch)
      .withColumn("shard", col("shard") + lit(base))
    // dynamic partition overwrite: only the NEW shard dirs are written;
    // static overwrite mode would wipe the existing layout
    assigned.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("cum_mass"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard").parquet(outDir)
    // manifest update reads back ONLY the new shard dirs (the shard >=
    // base filter partition-prunes the listing) and unions the old
    // rows — appending a batch must never re-scan the whole layout
    val newRows = spark.read.parquet(outDir)
      .filter(col("shard") >= base)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("docs"), sum(col("doc_mass")).as("mass"))
    val updated = readManifest(spark, outDir)
      .filter(col("shard") < base).unionByName(newRows)
      .localCheckpoint(true) // sever the read-before-overwrite cycle
    updated.write.mode("overwrite").parquet(manifestDir(outDir))
    readManifest(spark, outDir).localCheckpoint(true)
  }

  /** One shard of a [[writeShards]] layout, in serialization order —
    * what a (resumable) training loader reads per step. The `shard=`
    * partition filter prunes at FILE LISTING time (spec-pinned: the
    * scan's partition count is 1), so reading shard k of a 100 TB
    * layout costs one directory, not a scan of the corpus.
    */
  def readShard(spark: SparkSession, outDir: String,
      shard: Long): DataFrame =
    spark.read.parquet(outDir)
      .filter(col("shard") === shard)
      .sort(col("cum_mass"))

  private def manifestDir(outDir: String): String =
    s"$outDir/_graft_manifest"
}
