package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Sampling
import graft.storage.VersionedTable

/** Continuous weighted reservoir: folding micro-batches into a k-row
  * reservoir must equal ONE batch A-Res draw over everything seen — the
  * associativity the deterministic key buys — with exactly-once reservoir
  * commits under replay.
  */
class StreamingSampleSpec extends SparkSpec {
  import spark.implicits._

  test("stream-folded reservoir == batch weightedSample over all arrivals; replay-safe") {
    val srcDir = Files.createTempDirectory("graft_stream_sample_src_").toString
    val reservoir = Files.createTempDirectory("graft_stream_sample_").resolve("res").toString
    val k = 10

    val all = (1L to 120L).map(id => (id, 1L + id % 13))
    val schema = all.take(1).toDF("item_id", "w").schema

    def drain(maxFiles: Option[Int]): Unit = {
      val q = StreamingSample.start(spark, srcDir, schema, "item_id", "w", k,
        reservoir, availableNow = true, maxFilesPerTrigger = maxFiles)
      q.awaitTermination(120000)
    }

    // three arrival waves, drained as SEPARATE micro-batches (one file per
    // trigger) — the reservoir must track the batch draw after every wave
    val waves = Seq(all.slice(0, 40), all.slice(40, 90), all.slice(90, 120))
    var seen = Seq.empty[(Long, Long)]
    for (wave <- waves) {
      wave.toDF("item_id", "w").coalesce(1).write.mode("append").parquet(srcDir)
      seen = seen ++ wave
      drain(maxFiles = Some(1))
      val got = StreamingSample.current(spark, reservoir, "item_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._3).toSeq
      val want = Sampling.weightedSample(seen.toDF("item_id", "w"), "item_id", $"w", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._3).toSeq
      assert(got == want, s"after ${seen.size} arrivals: got $got\nexpected $want")
    }
    assert(VersionedTable.read(spark, reservoir).count() == k)

    // replay safety: re-committing the last batch id must be a no-op
    val m = VersionedTable.readManifest(reservoir).get
    VersionedTable.overwrite(reservoir, Some(m.batchId))(dir =>
      Seq((999L, 1.0)).toDF("item_id", "__w").write.parquet(dir))
    val after = StreamingSample.current(spark, reservoir, "item_id")
      .collect().map(_.getLong(0)).toSet
    assert(!after.contains(999L), "replayed batch id must be skipped")
    assert(after.size == k)
  }

  test("reservoir is insertion-order independent: reversed arrivals, same sample") {
    val srcDir = Files.createTempDirectory("graft_stream_sample_rev_src_").toString
    val reservoir = Files.createTempDirectory("graft_stream_sample_rev_").resolve("res").toString
    val all = (1L to 120L).map(id => (id, 1L + id % 13))
    val schema = all.take(1).toDF("item_id", "w").schema
    // arrive in reverse, two waves
    Seq(all.reverse.take(60), all.reverse.drop(60)).foreach { wave =>
      wave.toDF("item_id", "w").coalesce(1).write.mode("append").parquet(srcDir)
    }
    val q = StreamingSample.start(spark, srcDir, schema, "item_id", "w", 10,
      reservoir, availableNow = true, maxFilesPerTrigger = Some(1))
    q.awaitTermination(120000)
    val got = StreamingSample.current(spark, reservoir, "item_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._3).toSeq
    val want = Sampling.weightedSample(all.toDF("item_id", "w"), "item_id", $"w", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._3).toSeq
    assert(got == want, s"got $got\nexpected $want")
  }
}
