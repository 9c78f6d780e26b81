package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.functions.DedupFunctions
import graft.storage.VersionedTable

/** Continuous-ingest near-duplicate filtering — the streaming composition of
  * [[graft.functions.DedupFunctions.nearDupMinHashIncremental]] with the
  * manifest table: each micro-batch of new documents is
  *
  *   1. signed (shingles → MinHash) map-side,
  *   2. deduped against the LANDED signature corpus (corpus text never
  *      re-read; only its (id, sig) projection is banded),
  *   3. appended to the corpus signature table, and its dup pairs appended
  *      to the verdict table — both through batchId-guarded manifest
  *      commits, so a replayed micro-batch neither re-registers its
  *      signatures nor duplicates its verdicts (exactly-once).
  *
  * In-batch duplicates (two near-identical docs arriving in the SAME batch)
  * are caught by a batch-local pass before the corpus join, so the dup table
  * is complete across batch boundaries AND within them.
  *
  * 100 TB shape: per tick, work is O(new batch) signatures + one band join
  * against the corpus (id, sig) projection — the corpus grows by signature
  * bytes only, and dup verdicts are an append-only stream downstream
  * filtering can consume.
  */
object DedupStream {

  /** @param sourceDir   parquet directory to stream new documents from
    * @param schema      source schema (must contain idCol + textCol)
    * @param corpusPath  manifest table of landed signatures (created if absent)
    * @param dupsPath    manifest table receiving (new_id, dup_of, jaccard)
    * @param availableNow true = drain current files and stop (tests);
    *                     false = continuous at `trigger`
    */
  def start(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      idCol: String,
      textCol: String,
      corpusPath: String,
      dupsPath: String,
      threshold: Double = 0.8,
      numHashes: Int = 32,
      bands: Int = 8,
      trigger: String = "1 minute",
      availableNow: Boolean = false): StreamingQuery = {
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
    val writeParquet = (df: DataFrame, dir: String) => df.write.parquet(dir)
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val newSigs = DedupFunctions
          .minHashSignatures(batch, idCol, textCol, numHashes)
          .localCheckpoint(true) // one signature computation per batch, reused 4×
        // in-batch dups: batch-local band pass (tiny — O(batch) rows)
        val inBatch = DedupFunctions
          .nearDupMinHashFromSignatures(newSigs, threshold, numHashes, bands)
          .select("id_a", "id_b", "jaccard")
          .toDF("new_id", "dup_of", "jaccard")
        // cross-batch dups: new batch vs the landed corpus projection
        val vsCorpus =
          if (VersionedTable.exists(corpusPath)) {
            val corpus = VersionedTable.read(spark, corpusPath)
            DedupFunctions.nearDupMinHashIncrementalFromSignatures(
              newSigs, corpus, threshold, numHashes, bands)
          } else inBatch.limit(0)
        val verdicts = inBatch.unionByName(vsCorpus).localCheckpoint(true)
        // both appends are batchId-guarded: a replayed batch is skipped
        if (verdicts.count() > 0 || !VersionedTable.exists(dupsPath))
          VersionedTable.append(dupsPath, Some(bid))(dir => writeParquet(verdicts, dir))
        VersionedTable.append(corpusPath, Some(bid))(dir => writeParquet(newSigs, dir))
        ()
      }
      .option("checkpointLocation", corpusPath + "__checkpoint")
      .trigger(if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime(trigger))
      .start()
  }
}
