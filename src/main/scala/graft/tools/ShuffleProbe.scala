package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.DedupFunctions

/** Shuffle-byte evidence for the MinHash landing redesign: the round-2
  * shape carried each document's shingle-hash array through the band
  * shuffle (×bands per doc); the current shape lands signatures once and
  * bands only (band, band_hash, id) triples, re-joining payloads for
  * verification. Both arms produce identical pairs; this probe measures
  * total shuffle WRITE bytes per arm via a stage listener.
  *
  * Usage: tools/run.sh graft.tools.ShuffleProbe [sfDir]
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // make every exchange a real shuffle measurement (no broadcast arm
      // hiding bytes asymmetrically between the two shapes)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var shuffleBytes = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleBytes += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    })

    val docs = Tables.documents(spark, sfDir)

    // round-2 shape: hash arrays ride the band shuffle
    def inFlightArrays(): DataFrame = {
      val withSig = docs
        .select(col("doc_id").as("id"), DedupFunctions.shingleHashes(col("text")).as("hashes"))
        .withColumn("sig", DedupFunctions.minHashSignature(col("hashes"), 32))
      val banded = withSig
        .select(col("id"), col("hashes"),
          explode(DedupFunctions.lshBandKeys(col("sig"), 8, 4)).as("bk"))
        .select(col("id"), col("hashes"), col("bk.band").as("band"), col("bk.band_hash").as("band_hash"))
      banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.hashes").as("ha"), col("b.hashes").as("hb"))
        .distinct()
        .withColumn("jaccard", round(DedupFunctions.jaccard(col("ha"), col("hb")), 4))
        .filter(col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard")
    }

    def landed(): DataFrame = {
      val land = java.nio.file.Files.createTempDirectory("graft_shuffle_probe")
      DedupFunctions.nearDupMinHash(docs, "doc_id", "text",
        threshold = 0.5, numHashes = 32, bands = 8,
        landPath = Some(land.resolve("sigs").toString))
    }

    def measure(name: String)(df: => DataFrame): Long = {
      shuffleBytes = 0L
      val t0 = System.nanoTime()
      val n = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$name%-18s pairs=$n%6d  shuffle=${shuffleBytes / 1024.0 / 1024.0}%8.1f MiB  ${secs}%6.1f s")
      shuffleBytes
    }

    println(s"MinHash shuffle probe over $sfDir/documents.parquet (broadcast disabled)")
    val a = measure("in-flight-arrays")(inFlightArrays())
    val b = measure("landed-sigs")(landed())
    println(f"landed shape shuffles ${100.0 * b / a}%.0f%% of the in-flight bytes (${a.toDouble / b}%.1fx reduction)")
    spark.stop()
  }
}
