package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.ShardExport
import graft.storage.VersionedTable

/** Continuous export: each wave's manifests must equal the batch
  * exporter's run on that wave's data alone (per-wave packing, shards
  * immutable once written), with exactly-once manifest commits under
  * replay.
  */
class ShardStreamSpec extends SparkSpec {
  import spark.implicits._

  private def docRows(ids: Range) =
    ids.map(i => (i.toLong, Seq.fill(i % 11 + 1)("w").mkString(" ")))

  private def manifestSet(df: org.apache.spark.sql.DataFrame) =
    df.select("bucket", "shard_seq", "n_docs", "shard_tokens", "checksum", "first_doc")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet

  test("stream manifests == per-wave batch manifests; late wave appends; replay-safe") {
    val srcDir = Files.createTempDirectory("graft_shard_stream_src_").toString
    val exportRoot = Files.createTempDirectory("graft_shard_stream_").toString
    val manifestPath =
      java.nio.file.Paths.get(exportRoot, "manifest").toString
    val schema = docRows(0 to 0).toDF("doc_id", "text").schema

    def drain(): Unit = {
      val q = ShardStream.start(spark, srcDir, schema, "doc_id", "text",
        buckets = 4, budgetTokens = 60L, exportRoot = exportRoot,
        availableNow = true, maxFilesPerTrigger = Some(1))
      q.awaitTermination(120000)
    }

    // two waves landed before the first drain, one file each -> one wave
    // per micro-batch
    val w0 = docRows(0 until 80)
    val w1 = docRows(80 until 150)
    w0.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(srcDir)
    w1.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(srcDir)
    drain()

    def batchManifest(rows: Seq[(Long, String)]) =
      manifestSet(ShardExport.shardManifest(
        ShardExport.shardAssign(rows.toDF("doc_id", "text"), "doc_id", "text", 4, 60L),
        "doc_id"))

    val got = ShardStream.manifests(spark, exportRoot)
    val byWave = got.collect().groupBy(_.getLong(0))
    assert(byWave.keySet.size == 2, s"expected 2 waves, got ${byWave.keySet}")
    // wave ids follow landing order under maxFilesPerTrigger=1
    val waveSets = byWave.toSeq.sortBy(_._1).map { case (_, rows) =>
      rows.map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).toSet
    }
    assert(waveSets == Seq(batchManifest(w0), batchManifest(w1)),
      "each wave must match the batch exporter on that wave's data alone")

    // a late wave appends its own shards and touches nothing prior
    val w2 = docRows(150 until 190)
    w2.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(srcDir)
    drain()
    val after = ShardStream.manifests(spark, exportRoot)
    assert(after.filter(col("wave").isin(byWave.keySet.toSeq: _*)).count() ==
      got.count(), "prior waves' shards must be immutable")
    val lateWave = after.collect().groupBy(_.getLong(0)).keySet -- byWave.keySet
    assert(lateWave.size == 1)
    assert(after.filter(col("wave") === lateWave.head).count().toInt ==
      batchManifest(w2).size)

    // replay safety: re-committing an already-seen batch id is a no-op
    val m = VersionedTable.readManifest(manifestPath).get
    val before = after.count()
    VersionedTable.append(manifestPath, Some(m.batchId))(dir =>
      Seq((999L, 0L, 0L, 1L, 1L, 1L, 1L))
        .toDF("wave", "bucket", "shard_seq", "n_docs", "shard_tokens",
          "checksum", "first_doc")
        .write.parquet(dir))
    assert(VersionedTable.read(spark, manifestPath).count() == before,
      "replayed batch id must be skipped")

    // the stream lands PHYSICAL shards through the same writer: the
    // verified read-back (checksums recomputed from the committed files)
    // returns every doc of every wave intact
    val data = ShardExport.readShards(spark, exportRoot, "doc_id", "text")
    assert(data.count() == (w0 ++ w1 ++ w2).size.toLong,
      "every streamed doc must be present in the materialized shards")
  }
}
