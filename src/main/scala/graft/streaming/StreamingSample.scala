package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.functions.Sampling
import graft.storage.VersionedTable

/** Continuous weighted reservoir sampling — the streaming composition of
  * [[graft.functions.Sampling.weightedSample]] with the manifest table.
  *
  * A-Res is a perfect streaming fit because its key ln(u)/w is a PURE
  * FUNCTION of the row: top-k(A ∪ B) = top-k(top-k(A) ∪ B), so folding each
  * micro-batch into a k-row reservoir is exactly equivalent to one batch
  * draw over everything seen — no approximation, no arrival-order
  * dependence. Each tick:
  *
  *   1. the batch's (id, weight) candidates get their keys map-side,
  *   2. union with the landed ≤k-row reservoir (keys recomputed from the
  *      stored rows — nothing but (id, weight) persists),
  *   3. top-k of the union OVERWRITES the reservoir in one batchId-guarded
  *      manifest commit — a replayed micro-batch is skipped (exactly-once).
  *
  * 100 TB shape: per tick the work is one TakeOrderedAndProject over
  * O(batch + k) rows; the reservoir table is k rows forever. The candidate
  * stream never lands anywhere — only the winners do.
  */
object StreamingSample {

  /** @param sourceDir     parquet directory to stream candidates from
    * @param schema        source schema (must contain idCol + weightCol)
    * @param weightCol     strictly-positive numeric weight column
    * @param reservoirPath manifest table holding the ≤k-row reservoir
    * @param availableNow  true = drain current files and stop (tests)
    */
  def start(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      idCol: String,
      weightCol: String,
      k: Int,
      reservoirPath: String,
      trigger: String = "1 minute",
      availableNow: Boolean = false,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    require(k >= 1, s"k must be >= 1, got $k")
    val reader = spark.readStream.schema(schema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(sourceDir)
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val cand = batch.select(
          col(idCol), col(weightCol).cast("double").as("__w"))
        val prev =
          if (VersionedTable.exists(reservoirPath))
            VersionedTable.read(spark, reservoirPath)
          else cand.limit(0)
        val top = cand.unionByName(prev)
          .withColumn("__key", Sampling.aresKey(col(idCol), col("__w")))
          .orderBy(col("__key").desc, col(idCol).asc)
          .limit(k)
          .drop("__key")
          .localCheckpoint(true) // sever the read-from-reservoir lineage
                                 // before the overwrite replaces it
        VersionedTable.overwrite(reservoirPath, Some(bid))(dir =>
          top.write.parquet(dir))
        ()
      }
      .option("checkpointLocation", reservoirPath + "__checkpoint")
      .trigger(if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime(trigger))
      .start()
  }

  /** The current sample, ranked like [[Sampling.weightedSample]]'s output:
    * (idCol, weight, rank) — so stream and batch draws compare directly.
    */
  def current(spark: SparkSession, reservoirPath: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    VersionedTable.read(spark, reservoirPath)
      .withColumn("__key", Sampling.aresKey(col(idCol), col("__w")))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("__key").desc, col(idCol).asc)).cast("long"))
      .select(col(idCol), col("__w").cast("long").as("weight"), col("rank"))
  }
}
