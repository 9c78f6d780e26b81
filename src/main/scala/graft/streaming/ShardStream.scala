package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.functions.ShardExport
import graft.storage.VersionedTable

/** Continuous training-export — the streaming composition of
  * [[graft.functions.ShardExport.writeShards]] with the manifest table:
  * each micro-batch of newly-landed documents is packed and MATERIALIZED
  * by the SAME physical writer the batch exporter uses (one immutable
  * parquet file per shard, rows in packing order, manifest recomputed
  * from the committed files), with shards namespaced by the wave (the
  * micro-batch id) and both commits batchId-guarded (a replayed wave can
  * never double-pack or double-land).
  *
  * Packing is PER-WAVE by design, not an approximation to fix later:
  * the batch exporter's global md5-order packing is not incrementally
  * maintainable — one late document re-cuts every later shard boundary
  * in its bucket — and an export store needs shards IMMUTABLE once
  * written (readers hold manifests; a re-cut shard invalidates every
  * downstream epoch order). So the streaming contract is
  * `manifests == ⋃_wave shardManifest(shardAssign(wave))`, exact — each
  * wave's shards are a pure function of that wave's data, verified by
  * `ShardStreamSpec` against per-wave batch runs. Within a wave all the
  * batch-side scale properties hold (one bucket-hash exchange, compact
  * metadata-only shuffle, order-independent checksums).
  */
object ShardStream {

  /** Start packing newly-landed parquet documents under `sourceDir` into
    * per-wave physical shards + manifests under `exportRoot` (the
    * [[ShardExport.writeShards]] layout: `data/` + `manifest/`, both
    * VersionedTables). `availableNow = true` drains currently-landed
    * files and stops.
    */
  def start(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      idCol: String,
      textCol: String,
      buckets: Int,
      budgetTokens: Long,
      exportRoot: String,
      trigger: String = "1 minute",
      availableNow: Boolean = false,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(sourceDir)
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        // the batch writer end to end: land one immutable file per shard,
        // recompute the manifest from the committed files, commit both
        // under the wave's batchId guard (replay-safe)
        ShardExport.writeShards(batch, idCol, textCol, buckets, budgetTokens,
          exportRoot, wave = bid, guarded = true)
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Paths.get(exportRoot, "__checkpoint").toString)
      .trigger(if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime(trigger))
      .start()
  }

  /** The manifest table so far: (wave, bucket, shard_seq, n_docs,
    * shard_tokens, checksum, first_doc) — one row per immutable shard
    * (the byte-level `content_checksum` stays in the full
    * [[ShardExport.shardManifests]] relation).
    */
  def manifests(spark: SparkSession, exportRoot: String): DataFrame =
    ShardExport.shardManifests(spark, exportRoot)
      .select(col("wave"), col("bucket"), col("shard_seq"), col("n_docs"),
        col("shard_tokens"), col("checksum"), col("first_doc"))
}
