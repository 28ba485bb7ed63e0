package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travels as an opaque `binary` column with typed
  * metadata; decode / feature-extraction runs partition-parallel over the
  * bytes.
  *
  * The actual codecs (JPEG/PNG/WAV decode, resampling, frame extraction)
  * are *** STUBBED *** — this container ships no image/audio libraries —
  * with deterministic byte-level fakes, clearly marked below. Everything
  * Spark-side is real and tested: the schema, the binary column handling,
  * partition-wise batch shape, and the declarative metadata path.
  *
  * Scale notes: media rows are large (MBs); keep
  * `spark.sql.files.maxPartitionBytes` sized so a partition's batch fits
  * executor memory, and never collect. Feature extraction is a
  * `mapPartitions` (one codec init per partition, not per row) — the
  * Scala analog of a Pandas-UDF `mapInPandas` batch.
  */
object Multimodal {

  case class MediaMeta(media_type: String, width: Int, height: Int, channels: Int)
  case class MediaRow(media_id: Long, meta: MediaMeta, bytes: Array[Byte])
  case class MediaFeatures(media_id: Long, n_bytes: Long, byte_sum: Long,
                           head_byte: Int, entropy_proxy: Double)

  /** Wrap any table into the media schema, encoding a source column as the
    * opaque payload (stand-in for real image bytes in fixtures). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
              mediaType: String = "text/plain"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      struct(lit(mediaType).as("media_type"), lit(0).as("width"),
        lit(0).as("height"), lit(1).as("channels")).as("meta"),
      encode(col(payloadCol), "UTF-8").as("bytes"))

  /** Declarative (no-decode) metadata over the binary payload — stays in
    * whole-stage codegen. */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("meta.media_type").as("media_type"),
      octet_length(col("bytes")).cast("long").as("n_bytes"),
      col("bytes").isNull.as("is_missing"))

  /** Partition-parallel feature extraction over raw bytes.
    *
    * *** STUB ***: a real implementation would decode the payload here
    * (e.g. javax.imageio / JavaCV) and emit embeddings; this deterministic
    * fake derives features from the raw bytes so the plumbing (schema,
    * batching, partition shape) is fully exercised and verifiable.
    */
  def extractFeatures(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens HERE (codec/context), once per task
      rows.map { r =>
        val bytes = Option(r.bytes).getOrElse(Array.emptyByteArray)
        var sum = 0L
        var ones = 0L
        var i = 0
        while (i < bytes.length) {
          sum += bytes(i) & 0xFF
          ones += java.lang.Integer.bitCount(bytes(i) & 0xFF)
          i += 1
        }
        val bits = bytes.length * 8.0
        MediaFeatures(
          r.media_id,
          bytes.length.toLong,
          sum,
          if (bytes.isEmpty) -1 else bytes(0) & 0xFF,
          if (bits == 0) 0.0 else ones / bits)
      }
    }
  }

  /** *** STUB ***: resize for image payloads. Real impl: decode → scale →
    * re-encode inside mapPartitions. The fake truncates the payload to a
    * deterministic size proportional to the target area.
    */
  def resizeStub(media: Dataset[MediaRow], w: Int, h: Int)
                (implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    media.map { r =>
      val cap = math.max(1, math.min(Option(r.bytes).map(_.length).getOrElse(0), w * h))
      r.copy(meta = r.meta.copy(width = w, height = h),
        bytes = Option(r.bytes).getOrElse(Array.emptyByteArray).take(cap))
    }
  }

  /** *** STUB ***: sample every `stride`-th "frame" (fixed-size byte
    * window) from a video payload — the real impl would demux containers.
    * Output: one row per sampled frame, `(media_id, frame_no, frame_bytes)`.
    */
  def frameSampleStub(media: Dataset[MediaRow], frameBytes: Int, stride: Int)
                     (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.flatMap { r =>
      val bytes = Option(r.bytes).getOrElse(Array.emptyByteArray)
      bytes.grouped(frameBytes).zipWithIndex.collect {
        case (frame, idx) if idx % stride == 0 => (r.media_id, idx.toLong, frame)
      }
    }.toDF("media_id", "frame_no", "frame_bytes")
  }
}
