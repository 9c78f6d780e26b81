package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed batch-at-a-time per partition.
  *
  * IMAGE payloads decode for REAL — [[ImageCodec]] drives `javax.imageio`
  * (JDK-native PNG/JPEG/GIF/BMP), yielding true dimensions, frame counts,
  * per-channel means and a pooled-grayscale thumbnail embedding. AUDIO
  * payloads decode for REAL too — [[AudioCodec]] drives
  * `javax.sound.sampled` (JDK-native WAV/AU/AIFF), yielding true sample
  * rate, channels, duration and signal statistics. Payloads neither codec
  * accepts (and the video kind, which has no pure-JVM codec) fall back to
  * deterministic digest-derived features, clearly marked by
  * `decoded = false`. Swapping a real video codec in is a 1-function change
  * with the same `Iterator[MediaItem] => Iterator[...]` batch signature
  * (the same shape a `mapInPandas`/Arrow UDF would have).
  *
  * Scale design: payloads never shuffle — `withFeatures` is map-side only;
  * `repartitionForDecode` sizes partitions by total payload bytes, not row
  * count, so a 100 TB media corpus decodes with even executor load.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaItem(
      media_id: Long,
      kind: String,             // "image" | "audio" | "video"
      payload: Array[Byte],
      source: String,
      n_bytes: Long)

  /** Extracted per-item features (fixed-width, columnar-friendly).
    * `decoded = true` rows carry REAL pixel-derived values; `false` rows
    * carry the deterministic digest-derived fallback (undecodable payload
    * or a kind with no JVM codec).
    */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: String,         // hex digest of the payload
      decoded: Boolean,
      width: Int,
      height: Int,
      n_frames: Int,
      mean_r: Double,           // per-channel pixel means (decoded only)
      mean_g: Double,
      mean_b: Double,
      feature_vec: Array[Float]) // decoded: pooled-luma thumbnail; else digest-derived

  /** Batch decoder: real image decode with deterministic fallback. Every
    * output is a pure function of the payload bytes — stable across task
    * retries, safe for exactly-once sinks.
    */
  def decodeBatch(items: Iterator[MediaItem]): Iterator[MediaFeatures] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    items.map { it =>
      md.reset()
      val digest = md.digest(it.payload)
      val hex = digest.map("%02x".format(_)).mkString
      ImageCodec.decode(it.payload) match {
        case Some(d) =>
          MediaFeatures(it.media_id, it.kind, it.n_bytes, hex, decoded = true,
            d.width, d.height, d.nFrames, d.meanR, d.meanG, d.meanB, d.thumb)
        case None => pseudoFeatures(it, digest, hex)
      }
    }
  }

  /** Audio features (fixed-width, columnar-friendly). `decoded = true` rows
    * carry REAL signal-derived values via [[AudioCodec]]; `false` rows are
    * the deterministic fallback (undecodable payload).
    */
  final case class AudioFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: String,
      decoded: Boolean,
      sample_rate: Int,
      channels: Int,
      bits_per_sample: Int,
      n_frames: Long,
      duration_ms: Double,
      rms: Double,           // raw 16-bit units, channels pooled
      peak: Double)

  /** Batch audio decoder: real WAV/AU/AIFF decode with deterministic
    * fallback (all-zero stats, decoded=false) for undecodable payloads.
    */
  def decodeAudioBatch(items: Iterator[MediaItem]): Iterator[AudioFeatures] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    items.map { it =>
      md.reset()
      val hex = md.digest(it.payload).map("%02x".format(_)).mkString
      AudioCodec.decode(it.payload) match {
        case Some(d) =>
          AudioFeatures(it.media_id, it.kind, it.n_bytes, hex, decoded = true,
            d.sampleRate, d.channels, d.bitsPerSample, d.nFrames,
            d.durationMs, d.rms, d.peak)
        case None =>
          AudioFeatures(it.media_id, it.kind, it.n_bytes, hex, decoded = false,
            0, 0, 0, 0L, 0.0, 0.0, 0.0)
      }
    }
  }

  /** Audio decode/feature-extract pipeline: typed mapPartitions, map-side
    * only — payloads never shuffle.
    */
  def withAudioFeatures(items: Dataset[MediaItem]): Dataset[AudioFeatures] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions(decodeAudioBatch)
  }

  /** Video features. `decoded = true` rows carry REAL container+pixel
    * facts via [[VideoCodec]] (AVI with raw-DIB or MJPEG frames); `false`
    * rows are the deterministic fallback.
    */
  final case class VideoFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: String,
      decoded: Boolean,
      width: Int,
      height: Int,
      n_frames: Int,
      fps: Double,
      duration_ms: Double,
      mean_r: Double,
      mean_g: Double,
      mean_b: Double,
      luma_variance: Double)  // temporal activity: 0 = static clip

  /** Batch video decoder: real AVI decode with deterministic fallback. */
  def decodeVideoBatch(items: Iterator[MediaItem]): Iterator[VideoFeatures] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    items.map { it =>
      md.reset()
      val hex = md.digest(it.payload).map("%02x".format(_)).mkString
      VideoCodec.decode(it.payload) match {
        case Some(d) =>
          VideoFeatures(it.media_id, it.kind, it.n_bytes, hex, decoded = true,
            d.width, d.height, d.nFrames, d.fps, d.durationMs,
            d.meanR, d.meanG, d.meanB, VideoCodec.lumaVariance(d))
        case None =>
          VideoFeatures(it.media_id, it.kind, it.n_bytes, hex, decoded = false,
            0, 0, 0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
      }
    }
  }

  /** Video decode/feature-extract pipeline: typed mapPartitions, map-side
    * only — payloads never shuffle.
    */
  def withVideoFeatures(items: Dataset[MediaItem]): Dataset[VideoFeatures] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions(decodeVideoBatch)
  }

  /** Deterministic digest-derived fallback for payloads with no JVM codec
    * (or corrupt/unknown image bytes).
    */
  private def pseudoFeatures(
      it: MediaItem, digest: Array[Byte], hex: String): MediaFeatures = {
    val w = 64 + (java.lang.Byte.toUnsignedInt(digest(0)) % 64)
    val h = 64 + (java.lang.Byte.toUnsignedInt(digest(1)) % 64)
    val frames = if (it.kind == "video") 1 + (java.lang.Byte.toUnsignedInt(digest(2)) % 16) else 1
    val vec = digest.take(8).map(b => java.lang.Byte.toUnsignedInt(b) / 255.0f)
    MediaFeatures(it.media_id, it.kind, it.n_bytes, hex, decoded = false,
      w, h, frames, 0.0, 0.0, 0.0, vec)
  }

  /** Build a MediaItem dataset from any table with an id + a binary column. */
  def asMediaItems(
      df: DataFrame, idCol: String, payloadCol: String,
      kind: String, sourceCol: String): Dataset[MediaItem] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(idCol).cast("long").as("media_id"),
        lit(kind).as("kind"),
        col(payloadCol).cast("binary").as("payload"),
        col(sourceCol).cast("string").as("source"),
        octet_length(col(payloadCol).cast("binary")).cast("long").as("n_bytes"))
      .as[MediaItem]
  }

  /** Partition the corpus so each task decodes ~`targetBytesPerTask` of
    * payload — even load regardless of per-item size skew.
    */
  def repartitionForDecode(items: Dataset[MediaItem], totalBytes: Long,
      targetBytesPerTask: Long = 256L * 1024 * 1024): Dataset[MediaItem] = {
    val parts = math.max(1, (totalBytes / targetBytesPerTask).toInt)
    items.repartition(parts, col("media_id"))
  }

  /** The decode/feature-extract pipeline: typed mapPartitions, batch shape
    * Iterator→Iterator (streaming within the task, constant memory).
    */
  def withFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions(decodeBatch)
  }
}
