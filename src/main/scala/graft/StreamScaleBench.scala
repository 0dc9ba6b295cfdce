package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** TRUE-streaming scale measurement for the events family (BASELINE.md
  * streaming decade). The driver gates (`stream_upsert` etc.) check the
  * batch-equivalent fold — correct but not the production path; this
  * main pushes the SAME operators through the actual Structured
  * Streaming engine (file source, micro-batches, state store,
  * checkpointing) at replica scale, closing the "gate ≠ production
  * path" asymmetry with measured numbers.
  *
  * Three phases, each an AvailableNow run timed wall-clock:
  *  1. `upsert` — foreachBatch versioned-parquet latest-per-key state
  *     ([[graft.streaming.UpsertSink.run]]). Order-insensitive by
  *     design, so it reads the replica dir as-is. Cross-checked against
  *     the direct batch latest-per-key snapshot (count + exact-decimal
  *     value checksum must match).
  *  2. `sessionize_backfill` — stateful sessionization
  *     (flatMapGroupsWithState) with a RETAIN-ALL watermark — the
  *     correct setting for replaying history, where eviction would
  *     reset returning users' counts mid-replay. Streams the
  *     CHRONOLOGICAL copy (see below — the raw replica's interleaved
  *     file order violates the state API's in-order-per-key contract,
  *     independent of watermarking). State store holds every user; the
  *     final per-user emission is checked ROW-FOR-ROW equal to the
  *     batch gaps-and-islands sessionization.
  *  3. `sessionize_watermark` — the production shape: the same operator
  *     with its 2 h watermark over a CHRONOLOGICAL copy of the replica
  *     (time-bucketed files written in ascending order — the shape a
  *     log shipper delivers). Demonstrates bounded state: the store
  *     carries only watermark-live users, not history. No equality
  *     claim — eviction deliberately resets long-idle users
  *     (the documented bounded-state tradeoff).
  *
  * Rounds 11-12 added phases 4-7: payload-fingerprint dedup (retain-all
  * equality row + 2 h watermark bounded-state row), the stream-stream
  * click→purchase join (watermarked AND row-for-row equal to batch),
  * and the tumbling/sliding watermarked window aggregates (append-mode
  * emission row-for-row equal to the batch aggregate over closed
  * windows; open-tail windows counted).
  *
  * Usage: StreamScaleBench <sfStyleDir> [maxFilesPerTrigger]
  * `<sfStyleDir>` must contain `events.parquet/` as a DIRECTORY of part
  * files (the ReplicaGen layout) — a single-file table cannot feed the
  * file streaming source.
  */
object StreamScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val srcDir = s"$sfDir/events.parquet"
    val maxFiles = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_STATE_STORE=rocksdb switches the stateful phases to
    // the RocksDB provider — state lives on local disk with a bounded
    // in-memory working set, the provider a 100 TB deployment runs when
    // per-partition state outgrows executor heap (the HDFS-backed
    // default keeps every partition's map on-heap).
    val stateStore = sys.env.getOrElse("SPARK_GRAFT_STATE_STORE", "hdfs")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    val spark = (if (stateStore == "rocksdb")
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
    else builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val scratch = java.nio.file.Files
      .createTempDirectory("graft_stream_scale").toString
    val nEvents = Tables.read(spark, srcDir).count()
    require(nEvents > 0, s"no events under $srcDir")

    // ---- phase 1: foreachBatch upsert through the streaming engine
    val t0 = System.nanoTime()
    graft.streaming.UpsertSink.run(spark, srcDir,
      s"$scratch/state", s"$scratch/ckpt_upsert",
      maxFilesPerTrigger = maxFiles)
    val upsertWall = (System.nanoTime() - t0) / 1e9

    val live = graft.streaming.UpsertSink.liveState(spark, s"$scratch/state")
    val streamChk = live.agg(count(lit(1)).as("n"),
      sum($"v".cast("decimal(28,6)")).as("s")).collect()(0)
    val ev = Tables(spark, sfDir, "events")
    val batchChk = ev.groupBy($"user_id")
      .agg(max_by($"value", struct(
        graft.functions.TimeFunctions.epochMicros(ev, "ts"), $"event_id"))
        .as("v"))
      .agg(count(lit(1)).as("n"),
        sum($"v".cast("decimal(28,6)")).as("s")).collect()(0)
    val upsertOk = streamChk == batchChk
    val stateBytes = graft.operators.Tune.parquetBytes(s"$scratch/state")
    println(f"""{"phase":"upsert_foreachbatch","src":"$srcDir","n_events":$nEvents,"wall_sec":$upsertWall%.1f,"live_keys":${streamChk.getLong(0)},"matches_batch_snapshot":$upsertOk,"state_table_bytes":$stateBytes}""")

    def sessionStream(dir: String, watermark: String, outDir: String,
        ckpt: String, filesPerTrigger: Int): (Double, Long, Long, Long) = {
      // maxFilesPerTrigger is a SOURCE option: set on readStream (on
      // the sink it is silently ignored and the whole corpus becomes
      // one micro-batch — defeating the point of the measurement)
      val schema = spark.read.parquet(dir).schema
      val events = graft.Tables.normalize(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", filesPerTrigger).parquet(dir))
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
        .as[graft.streaming.EventStreams.Event]
      val sessions = graft.streaming.EventStreams
        .sessionizeStateful(events, gapSeconds = 1800, watermark = watermark)
      val t = System.nanoTime()
      val q = sessions.toDF().writeStream
        .outputMode(OutputMode.Update)
        .foreachBatch { (b: DataFrame, batchId: Long) =>
          // persist every update stamped with its batch — the latest
          // batch's row per user is the final state, recoverable in one
          // batch job afterwards (a driver-side map would not scale)
          b.withColumn("__b", lit(batchId))
            .write.mode("append").parquet(outDir)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t) / 1e9
      val st = q.recentProgress.reverse
        .find(p => p.stateOperators.nonEmpty &&
          p.stateOperators(0).numRowsTotal > 0)
        .map(_.stateOperators(0))
      (wall, q.recentProgress.count(_.numInputRows > 0).toLong,
        st.map(_.numRowsTotal).getOrElse(-1L),
        st.map(_.memoryUsedBytes).getOrElse(-1L))
    }

    // Both sessionization phases stream a CHRONOLOGICAL copy of the
    // replica: time-bucketed files written oldest-first, so the
    // FileStreamSource (which picks files up in modification-time
    // order) delivers micro-batches in event-time order — the
    // log-shipper delivery shape. This matters for CORRECTNESS, not
    // just watermarks: flatMapGroupsWithState is the raw state API and
    // carries the standard in-order-per-key delivery contract across
    // batches (within a batch the operator sorts); the raw replica's
    // part files interleave the full time range, which scrambles
    // session order batch-to-batch. (The upsert phase above reads the
    // RAW dir deliberately — order-insensitivity is its design claim.)
    val chronoDir = s"$scratch/chrono"
    val bounds = ev.select(
        graft.functions.TimeFunctions.epochMicros(ev, "ts").cast("double")
          .as("us"))
      .agg(min($"us").as("lo"), max($"us").as("hi")).collect()(0)
    val (lo, hi) = (bounds.getDouble(0), bounds.getDouble(1))
    val nBuckets = 50
    // a NULL ts must not silently vanish from the copy (the equality
    // check compares against sessionizeBatch over ALL rows) — null-ts
    // rows land in bucket 0, matching their null-first order in the
    // session sort. The coalesce sits INSIDE the least(): least()
    // skips null args, so least(n-1, null) would be n-1, routing null
    // ts to the LAST bucket and making an outer coalesce dead code.
    val evB = ev.withColumn("__bkt", least(lit(nBuckets - 1),
      coalesce(floor((graft.functions.TimeFunctions.epochMicros(ev, "ts")
        .cast("double") - lo) / ((hi - lo) / nBuckets + 1e-9)).cast("int"),
        lit(0))))
    (0 until nBuckets).foreach { k =>
      evB.filter($"__bkt" === k).drop("__bkt")
        .coalesce(1).write.mode("append").parquet(chronoDir)
    }
    // ~10 micro-batches at any scale: per-batch state-store commits and
    // planning are a fixed cost (~1-2 s each at local[32]) that would
    // otherwise swamp the 1x point
    val chronoFiles = Option(new java.io.File(chronoDir).listFiles())
      .map(_.count(f => f.getName.endsWith(".parquet"))).getOrElse(0)
    val chronoMax = math.max(1, chronoFiles / 10)

    // ---- phase 2: backfill sessionization, retain-all, equality-checked
    val sessOut = s"$scratch/sessions"
    val (sWall, sBatches, sRows, sMem) =
      sessionStream(chronoDir, "3650 days", sessOut, s"$scratch/ckpt_sess",
        chronoMax)
    val finalPerUser = spark.read.parquet(sessOut)
      .groupBy($"user_id")
      .agg(max_by(struct($"n_events", $"n_sessions"), $"__b").as("r"))
      .select($"user_id", $"r.n_events", $"r.n_sessions")
    val batchSess = graft.streaming.EventStreams
      .sessionizeBatch(ev, gapSeconds = 1800)
      .select($"user_id", $"n_events", $"n_sessions")
    val diff = finalPerUser.exceptAll(batchSess).count() +
      batchSess.exceptAll(finalPerUser).count()
    println(f"""{"phase":"sessionize_backfill","state_store":"$stateStore","src":"$chronoDir (chronological copy of $srcDir)","n_events":$nEvents,"wall_sec":$sWall%.1f,"batches":$sBatches,"state_rows":$sRows,"state_mem_bytes":$sMem,"mismatch_rows_vs_batch":$diff}""")

    // ---- phase 3: the production 2 h watermark — bounded state via
    // event-time eviction (state carries watermark-live users only; no
    // equality claim: eviction deliberately resets long-idle users,
    // the documented bounded-state tradeoff)
    val (wWall, wBatches, wRows, wMem) =
      sessionStream(chronoDir, "2 hours", s"$scratch/sessions_wm",
        s"$scratch/ckpt_sess_wm", chronoMax)
    println(f"""{"phase":"sessionize_watermark","state_store":"$stateStore","src":"$chronoDir (chronological copy of $srcDir)","n_events":$nEvents,"wall_sec":$wWall%.1f,"batches":$wBatches,"state_rows":$wRows,"state_mem_bytes":$wMem}""")

    // generic append-mode runner for the remaining stateful operators
    // (dedup / stream-stream join): parquet sink, AvailableNow, same
    // state metrics as sessionStream
    def appendStream(dir: String, outDir: String, ckpt: String,
        filesPerTrigger: Int)(xform: DataFrame => DataFrame)
        : (Double, Long, Long, Long) = {
      val schema = spark.read.parquet(dir).schema
      val events = graft.Tables.normalize(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", filesPerTrigger).parquet(dir))
      val t = System.nanoTime()
      val q = xform(events).writeStream
        .outputMode(OutputMode.Append)
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t) / 1e9
      val st = q.recentProgress.reverse
        .find(p => p.stateOperators.nonEmpty &&
          p.stateOperators(0).numRowsTotal > 0)
        .map(_.stateOperators(0))
      (wall, q.recentProgress.count(_.numInputRows > 0).toLong,
        st.map(_.numRowsTotal).getOrElse(-1L),
        st.map(_.memoryUsedBytes).getOrElse(-1L))
    }

    // ---- phase 4: payload-fingerprint dedup through the engine.
    // Retain-all watermark ⇒ global dedup, so the emitted fingerprint
    // set must equal the batch dropDuplicates("fp") set EXACTLY (and
    // the emitted row count must equal the distinct-fp count — no
    // double emission, no loss). Then the production 2 h watermark for
    // the bounded-state row (no equality claim: a payload recurring
    // beyond the horizon is re-emitted by design).
    val dedupOut = s"$scratch/dedup"
    val (dWall, dBatches, dRows, dMem) =
      appendStream(chronoDir, dedupOut, s"$scratch/ckpt_dedup", chronoMax)(
        ev0 => graft.streaming.EventStreams.dedupStream(ev0,
          watermark = "3650 days"))
    val streamFp = spark.read.parquet(dedupOut)
    val batchFp = graft.streaming.EventStreams.dedupStream(ev)
      .select($"fp")
    val dDiff = streamFp.select($"fp").exceptAll(batchFp).count() +
      batchFp.exceptAll(streamFp.select($"fp")).count()
    val dEmitted = streamFp.count()
    println(f"""{"phase":"dedup_stream_retain_all","state_store":"$stateStore","src":"$chronoDir","n_events":$nEvents,"wall_sec":$dWall%.1f,"batches":$dBatches,"state_rows":$dRows,"state_mem_bytes":$dMem,"emitted":$dEmitted,"mismatch_fps_vs_batch":$dDiff}""")
    val (dwWall, dwBatches, dwRows, dwMem) =
      appendStream(chronoDir, s"$scratch/dedup_wm",
        s"$scratch/ckpt_dedup_wm", chronoMax)(
        ev0 => graft.streaming.EventStreams.dedupStream(ev0,
          watermark = "2 hours"))
    println(f"""{"phase":"dedup_stream_watermark","state_store":"$stateStore","src":"$chronoDir","n_events":$nEvents,"wall_sec":$dwWall%.1f,"batches":$dwBatches,"state_rows":$dwRows,"state_mem_bytes":$dwMem}""")

    // ---- phase 5: stream-stream inner join (click→purchase
    // attribution) with the PRODUCTION 2 h watermark — and still
    // row-for-row equal to batch: delivery is chronological (bucketed
    // files ≫ 2 h wide, watermark only advances between batches), so
    // no event is ever late and every evicted click is older than any
    // future purchase's window — eviction can't lose a match. Bounded
    // state AND exact equality in one measured run.
    val joinOut = s"$scratch/join"
    val (jWall, jBatches, jRows, jMem) =
      appendStream(chronoDir, joinOut, s"$scratch/ckpt_join", chronoMax)(
        ev0 => graft.streaming.EventStreams.attributePurchases(ev0))
    val streamJoin = spark.read.parquet(joinOut)
      .select($"user_id", $"click_id", $"purchase_id")
    val batchJoin = graft.streaming.EventStreams.attributePurchases(ev)
      .select($"user_id", $"click_id", $"purchase_id")
    val jDiff = streamJoin.exceptAll(batchJoin).count() +
      batchJoin.exceptAll(streamJoin).count()
    val jEmitted = streamJoin.count()
    println(f"""{"phase":"join_stream_watermark","state_store":"$stateStore","src":"$chronoDir","n_events":$nEvents,"wall_sec":$jWall%.1f,"batches":$jBatches,"state_rows":$jRows,"state_mem_bytes":$jMem,"emitted":$jEmitted,"mismatch_rows_vs_batch":$jDiff}""")

    // ---- phases 6-7: watermarked windowed aggregation (tumbling +
    // sliding) through the engine — the last two operators whose gates
    // were batch-equivalent-only. Append mode emits a window exactly
    // once, when the 2 h watermark passes its end; chronological
    // delivery makes emission monotone in window start, so the emitted
    // set must be row-for-row EQUAL to the batch aggregate restricted
    // to windows at or before the last emitted one, and the only batch
    // rows missing are the watermark-open tail (counted, and checked
    // to start strictly after the last emitted window). State rows =
    // open (window, event_type) groups, NOT history — the bounded-state
    // evidence for the windowed family.
    def windowedPhase(name: String, startCol: String,
        xform: DataFrame => DataFrame): Unit = {
      val out = s"$scratch/$name"
      val (wWall2, wBatches2, wRows2, wMem2) =
        appendStream(chronoDir, out, s"$scratch/ckpt_$name", chronoMax)(xform)
      val streamed = spark.read.parquet(out)
      val batch = xform(ev)
      val maxEmitted = streamed.agg(max(col(startCol))).collect()(0)
      if (maxEmitted.isNullAt(0)) {
        println(f"""{"phase":"$name","state_store":"$stateStore","src":"$chronoDir","n_events":$nEvents,"wall_sec":$wWall2%.1f,"batches":$wBatches2,"emitted":0,"note":"nothing emitted — watermark never passed a window end"}""")
      } else {
        val cutoff = maxEmitted.getTimestamp(0)
        val closed = batch.filter(col(startCol) <= lit(cutoff))
        val mismatch = closed.exceptAll(streamed).count() +
          streamed.exceptAll(closed).count()
        val tail = batch.filter(col(startCol) > lit(cutoff)).count()
        println(f"""{"phase":"$name","state_store":"$stateStore","src":"$chronoDir","n_events":$nEvents,"wall_sec":$wWall2%.1f,"batches":$wBatches2,"state_rows":$wRows2,"state_mem_bytes":$wMem2,"emitted":${streamed.count()},"mismatch_vs_batch_closed_windows":$mismatch,"open_tail_windows":$tail}""")
      }
    }
    windowedPhase("hourly_agg_stream", "hour_start",
      ev0 => graft.streaming.EventStreams.hourlyAgg(ev0))
    windowedPhase("sliding_agg_stream", "win_start",
      ev0 => graft.streaming.EventStreams.slidingAgg(ev0))

    spark.stop()
  }
}
