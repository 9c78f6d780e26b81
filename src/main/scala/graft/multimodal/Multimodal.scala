package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed batch-at-a-time per partition.
  *
  * The Spark-side contract is real and tested — schema, partitioning, batch
  * shape, and the typed `mapPartitions` pipeline — while the actual media
  * decoding is a clearly-marked STUB (`decodeStub`): the container has no
  * image/audio libraries, so the stub produces deterministic pseudo-features
  * derived from the payload bytes. Swapping in a real decoder is a 1-function
  * change with the same `Iterator[MediaItem] => Iterator[MediaFeatures]`
  * batch signature (the same shape a `mapInPandas`/Arrow UDF would have).
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

  /** Extracted per-item features (fixed-width, columnar-friendly). */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: String,         // hex digest of the payload
      width: Int,               // STUB: pseudo-dimensions
      height: Int,
      n_frames: Int,
      feature_vec: Array[Float]) // STUB: deterministic pseudo-embedding

  /** ??? — real decoder goes here (libjpeg/ffmpeg/...); STUB for now.
    * Deterministic: every output is a pure function of the payload bytes.
    */
  def decodeStub(items: Iterator[MediaItem]): Iterator[MediaFeatures] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    items.map { it =>
      md.reset()
      val digest = md.digest(it.payload)
      val hex = digest.map("%02x".format(_)).mkString
      // pseudo-dimensions/frames derived from digest bytes (deterministic)
      val w = 64 + (java.lang.Byte.toUnsignedInt(digest(0)) % 64)
      val h = 64 + (java.lang.Byte.toUnsignedInt(digest(1)) % 64)
      val frames = if (it.kind == "video") 1 + (java.lang.Byte.toUnsignedInt(digest(2)) % 16) else 1
      val vec = digest.take(8).map(b => java.lang.Byte.toUnsignedInt(b) / 255.0f)
      MediaFeatures(it.media_id, it.kind, it.n_bytes, hex, w, h, frames, vec)
    }
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
    items.mapPartitions(decodeStub)
  }
}
