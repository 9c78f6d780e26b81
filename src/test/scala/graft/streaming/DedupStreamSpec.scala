package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.storage.VersionedTable

/** Continuous-ingest dedup: per batch, new docs are deduped against the
  * landed corpus AND within the batch, then folded into the corpus — with
  * exactly-once manifest growth across drains.
  */
class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  test("cross-batch and in-batch dups are found; corpus grows exactly once per batch") {
    val t1 = "the quick brown fox jumps over the lazy dog again and again today"
    val t2 = "an entirely different corpus document about catalyst optimizer rules"
    val fresh = "novel content concerning shuffle partitioning strategies at scale"
    val srcDir = Files.createTempDirectory("graft_dedup_stream_src_").toString
    val corpus = Files.createTempDirectory("graft_dedup_stream_").resolve("corpus").toString
    val dups = Files.createTempDirectory("graft_dedup_stream_").resolve("dups").toString

    val schema = Seq((1L, t1)).toDF("doc_id", "text").schema
    def drain(): Unit = {
      val q = DedupStream.start(spark, srcDir, schema, "doc_id", "text",
        corpus, dups, threshold = 0.5, availableNow = true)
      q.awaitTermination(120000)
    }

    // batch 1: two distinct docs seed the corpus
    Seq((1L, t1), (2L, t2)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    drain()
    assert(VersionedTable.read(spark, corpus).count() == 2)

    // batch 2: doc 10 duplicates corpus doc 1 (cross-batch); docs 11 and 12
    // duplicate each other (in-batch); all three join the corpus
    Seq((10L, t1), (11L, fresh), (12L, fresh)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    drain()

    val verdicts = VersionedTable.read(spark, dups)
      .as[(Long, Long, Double)].collect().toSet
    assert(verdicts == Set((10L, 1L, 1.0), (11L, 12L, 1.0)),
      s"expected one cross-batch and one in-batch dup, got $verdicts")
    assert(VersionedTable.read(spark, corpus).count() == 5,
      "every new doc (dup or not) must register its signature exactly once")
    // replay safety: the corpus manifest's batchId guard refuses a re-commit
    // of an already-processed batch id
    val m = VersionedTable.readManifest(corpus).get
    VersionedTable.append(corpus, Some(m.batchId))(dir =>
      Seq((99L, "x")).toDF("id", "text").write.parquet(dir))
    assert(VersionedTable.read(spark, corpus).count() == 5, "replayed batch must be skipped")
  }
}
