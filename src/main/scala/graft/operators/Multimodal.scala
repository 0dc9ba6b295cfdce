package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-local batches.
  *
  * The actual media codecs are NOT in this container, so [[StubDecoder]]
  * is a clearly-marked deterministic stand-in — but everything Spark-side
  * is real and tested: the schema contract, the typed Dataset plumbing,
  * the `mapPartitions` batch shape (decode amortized per-batch, not
  * per-row), and the frame-sampling expansion. Swapping in a real decoder
  * means implementing [[MediaDecoder.decode]] only.
  *
  * Scale notes: binary payloads ride the scan — no shuffle is introduced
  * by decode (narrow mapPartitions); frame sampling uses a generator
  * (explode) so output partitioning inherits the input; reading real data
  * would set `spark.sql.files.maxPartitionBytes` low enough that a
  * partition of blobs fits executor memory.
  */
object Multimodal {

  /** One media object: opaque payload + declared kind/format. */
  final case class MediaRecord(media_id: Long, kind: String, format: String,
      content: Array[Byte])

  /** Decoded (or probed) technical metadata. */
  final case class MediaMeta(media_id: Long, kind: String, format: String,
      byte_len: Long, sha256: String, width: Int, height: Int,
      duration_ms: Long, sample_rate: Int)

  /** The decode seam. A real implementation would wrap e.g. javacv /
    * a JNI codec; batchHint lets implementations amortize codec init.
    */
  trait MediaDecoder extends Serializable {
    def decode(r: MediaRecord): MediaMeta
  }

  /** STUB — deterministic fake decoder (no media libs in this
    * container). Derives plausible metadata purely from the payload
    * bytes (sha256-seeded, chosen because the DuckDB oracle can
    * replicate it — sha1 isn't available there), so tests are stable,
    * the full pipeline runs end-to-end, AND the driver gate checks the
    * whole decode path against independent SQL.
    */
  object StubDecoder extends MediaDecoder {
    override def decode(r: MediaRecord): MediaMeta = {
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(r.content)
      val shaHex = sha.map("%02x".format(_)).mkString
      val h = java.nio.ByteBuffer.wrap(sha, 0, 8).getLong
      val (w, ht, dur, sr) = r.kind match {
        case "image" => (640 + (Math.floorMod(h, 8L) * 160).toInt,
          360 + (Math.floorMod(h >> 8, 8L) * 90).toInt, 0L, 0)
        case "audio" => (0, 0, 1000L + Math.floorMod(h, 600000L), 16000)
        case "video" => (1280, 720, 1000L + Math.floorMod(h, 3600000L), 0)
        case _       => (0, 0, 0L, 0)
      }
      MediaMeta(r.media_id, r.kind, r.format, r.content.length.toLong,
        shaHex, w, ht, dur, sr)
    }
  }

  /** Demo media table derived deterministically from `documents` (text
    * bytes as payload) — exercises the binary-column path without real
    * media files.
    */
  def demoMediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(lit(Array("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      element_at(lit(Array("png", "wav", "mp4")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
      col("text").cast("binary").as("content"))

  /** Decode metadata in partition-local batches (the mapInPandas shape,
    * Scala-typed): no shuffle, decoder amortized per partition.
    */
  def decodeMeta(media: DataFrame, decoder: MediaDecoder = StubDecoder): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it => it.map(decoder.decode) }
  }

  /** Frame-sampling plan: for video rows, emit (media_id, frame_idx,
    * frame_ts_ms) at `fps` frames/sec from decoded duration — a
    * generator, no shuffle. Decode of the frame pixels themselves is the
    * stubbed seam.
    */
  def sampleFrames(meta: Dataset[MediaMeta], fps: Double): DataFrame = {
    val stepMs = math.max(1L, (1000.0 / fps).toLong)
    meta.toDF()
      .filter(col("kind") === "video" && col("duration_ms") > 0)
      .select(col("media_id"), col("duration_ms"),
        explode(sequence(lit(0L), expr(s"(duration_ms - 1) div $stepMs"))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        (col("frame_idx") * stepMs).as("frame_ts_ms"))
  }

  /** Resize plan for images: pure metadata transform preserving aspect
    * ratio to fit within (maxW, maxH); the pixel resample is the stubbed
    * seam.
    */
  def resizePlan(meta: Dataset[MediaMeta], maxW: Int, maxH: Int): DataFrame =
    meta.toDF()
      .filter(col("kind") === "image" && col("width") > 0 && col("height") > 0)
      .withColumn("scale",
        least(lit(maxW).cast("double") / col("width"),
          lit(maxH).cast("double") / col("height"), lit(1.0)))
      .select(col("media_id"), col("width"), col("height"),
        floor(col("width") * col("scale")).cast("int").as("out_width"),
        floor(col("height") * col("scale")).cast("int").as("out_height"))
}
