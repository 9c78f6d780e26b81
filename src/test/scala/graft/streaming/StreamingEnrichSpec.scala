package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pit.AsOfJoin
import graft.storage.VersionedTable

/** Streaming point-in-time enrichment: each micro-batch of spine events is
  * as-of joined against the latest COMMITTED feature snapshot through the
  * SAME batch operator training sets use (zero online/offline skew), with
  * exactly-once appends and per-batch snapshot re-resolution.
  */
class StreamingEnrichSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def featV1 = Seq(
    (1L, ts("2024-01-01 00:00:00"), 10.0),
    (1L, ts("2024-01-03 00:00:00"), 30.0),
    (2L, ts("2024-01-02 00:00:00"), 20.0)).toDF("k", "fts", "score")

  private def drain(srcDir: String, schema: org.apache.spark.sql.types.StructType,
      featPath: String, outPath: String): Unit = {
    val q = StreamingEnrich.start(spark, srcDir, schema, Seq("k"), "ets",
      featPath, "fts", outPath, availableNow = true)
    q.awaitTermination(120000)
  }

  test("stream ≡ batch against the pinned snapshot; refresh picked up next tick; replay-safe") {
    val srcDir = Files.createTempDirectory("graft_enrich_src_").toString
    val featPath = Files.createTempDirectory("graft_enrich_").resolve("features").toString
    val outPath = Files.createTempDirectory("graft_enrich_").resolve("out").toString
    VersionedTable.overwrite(featPath)(dir => featV1.write.parquet(dir))

    val events1 = Seq(
      (100L, 1L, ts("2024-01-02 12:00:00")), // sees k=1 @ 01-01 → 10.0
      (101L, 2L, ts("2024-01-02 12:00:00")), // sees k=2 @ 01-02 → 20.0
      (102L, 3L, ts("2024-01-02 12:00:00"))) // no feature row → null
      .toDF("event_id", "k", "ets")
    val schema = events1.schema
    events1.coalesce(1).write.mode("append").parquet(srcDir)
    drain(srcDir, schema, featPath, outPath)

    val out1 = VersionedTable.read(spark, outPath)
    val expected1 = AsOfJoin.joinAsOf(events1, featV1, Seq("k"), "ets", "fts", Seq("score"))
    assert(out1.collect().toSet == expected1.collect().toSet,
      "stream output must equal the batch as-of join over the same snapshot")
    assert(out1.filter($"event_id" === 100L).head.getAs[Double]("score") == 10.0)
    assert(out1.filter($"event_id" === 102L).select($"score").head.isNullAt(0))

    // a refresh commits BETWEEN ticks: the next batch sees the new snapshot
    val featV2 = featV1.unionByName(
      Seq((3L, ts("2024-01-01 06:00:00"), 99.0)).toDF("k", "fts", "score"))
    VersionedTable.overwrite(featPath)(dir => featV2.write.parquet(dir))
    val events2 = Seq((103L, 3L, ts("2024-01-02 12:00:00"))).toDF("event_id", "k", "ets")
    events2.coalesce(1).write.mode("append").parquet(srcDir)
    drain(srcDir, schema, featPath, outPath)

    val out2 = VersionedTable.read(spark, outPath)
    assert(out2.count() == 4)
    assert(out2.filter($"event_id" === 103L).head.getAs[Double]("score") == 99.0,
      "post-refresh batch must resolve against the NEW committed snapshot")

    // replay safety: draining with no new files must not grow the output,
    // and the manifest's batchId guard refuses a re-commit of batch 0
    drain(srcDir, schema, featPath, outPath)
    assert(VersionedTable.read(spark, outPath).count() == 4)
    val m = VersionedTable.readManifest(outPath).get
    assert(m.batchId >= 0, "streaming appends must record their batch id")
  }

  test("hot-key detection runs ONCE per committed snapshot across micro-batches") {
    // Without the snapshot-keyed memo, every micro-batch re-paid the sampled
    // detection aggregation against the same committed feature table. The
    // memo must hold the job count at one per snapshot, and a refresh commit
    // (new manifest version) must invalidate it — exactly one more job.
    val srcDir = Files.createTempDirectory("graft_enrich_src3_").toString
    val featPath = Files.createTempDirectory("graft_enrich3_").resolve("features").toString
    val outPath = Files.createTempDirectory("graft_enrich3_").resolve("out").toString
    VersionedTable.overwrite(featPath)(dir => featV1.write.parquet(dir))
    val c = spark.conf
    // clear the stats short-circuit so detection genuinely submits a job,
    // and sample at full rate so the tiny fixture is deterministic
    c.set("graft.asof.salt.hotKeyThreshold", "1")
    c.set("graft.asof.salt.sampleRate", "1.0")
    AsOfJoin.clearHotKeyCache()
    try {
      val schema = Seq((0L, 0L, ts("2024-01-01 00:00:00")))
        .toDF("event_id", "k", "ets").schema
      val before = AsOfJoin.detectionJobs.get()
      (0 until 3).foreach { i =>
        Seq((100L + i, 1L, ts("2024-01-02 12:00:00"))).toDF("event_id", "k", "ets")
          .coalesce(1).write.mode("append").parquet(srcDir)
        drain(srcDir, schema, featPath, outPath)
      }
      assert(AsOfJoin.detectionJobs.get() - before == 1,
        s"expected exactly 1 detection job across 3 micro-batches on one snapshot, " +
          s"got ${AsOfJoin.detectionJobs.get() - before}")
      // a refresh commits a NEW manifest version: the memo key changes and
      // detection runs exactly once more
      VersionedTable.overwrite(featPath)(dir => featV1.write.parquet(dir))
      Seq((110L, 1L, ts("2024-01-02 12:00:00"))).toDF("event_id", "k", "ets")
        .coalesce(1).write.mode("append").parquet(srcDir)
      drain(srcDir, schema, featPath, outPath)
      assert(AsOfJoin.detectionJobs.get() - before == 2,
        "a refresh commit must invalidate the detection memo (one more job, not zero, not N)")
      // results stay correct throughout (k=1 latest-<= match at 2024-01-01)
      val out = VersionedTable.read(spark, outPath)
      assert(out.count() == 4)
      assert(out.filter($"event_id" === 100L).head.getAs[Double]("score") == 10.0)
    } finally {
      c.unset("graft.asof.salt.hotKeyThreshold")
      c.unset("graft.asof.salt.sampleRate")
      AsOfJoin.clearHotKeyCache()
    }
  }

  test("optimize and retention between ticks: serving tracks the maintained snapshot") {
    val srcDir = Files.createTempDirectory("graft_enrich_src4_").toString
    val featPath = Files.createTempDirectory("graft_enrich4_").resolve("features").toString
    val outPath = Files.createTempDirectory("graft_enrich4_").resolve("out").toString
    def micros(s: String): Long =
      spark.sql(s"SELECT unix_micros(CAST('$s' AS TIMESTAMP))").head().getLong(0)
    // feature history as two stats-bearing append segments (the sink shape
    // maintenance operates on)
    val old = Seq((1L, ts("2024-01-01 00:00:00"), 10.0),
      (2L, ts("2024-01-02 00:00:00"), 20.0)).toDF("k", "fts", "score")
    val newer = Seq((1L, ts("2024-01-03 00:00:00"), 30.0)).toDF("k", "fts", "score")
    VersionedTable.append(featPath,
      stats = VersionedTable.SegStats.of(old, "fts"))(d => old.write.parquet(d))
    VersionedTable.append(featPath,
      stats = VersionedTable.SegStats.of(newer, "fts"))(d => newer.write.parquet(d))

    val events1 = Seq((200L, 1L, ts("2024-01-04 00:00:00")),
      (201L, 2L, ts("2024-01-04 00:00:00"))).toDF("event_id", "k", "ets")
    val schema = events1.schema
    events1.coalesce(1).write.mode("append").parquet(srcDir)
    drain(srcDir, schema, featPath, outPath)
    val out1 = VersionedTable.read(spark, outPath)
    assert(out1.filter($"event_id" === 200L).head.getAs[Double]("score") == 30.0)
    assert(out1.filter($"event_id" === 201L).head.getAs[Double]("score") == 20.0)

    // OPTIMIZE between ticks: content must be invisible to serving
    VersionedTable.optimize(spark, featPath, numFiles = 2,
      zorderBy = Seq("k", "fts"), statsCol = Some("fts"))
    assert(VersionedTable.readManifest(featPath).get.segments.size == 1)
    Seq((202L, 1L, ts("2024-01-04 00:00:00"))).toDF("event_id", "k", "ets")
      .coalesce(1).write.mode("append").parquet(srcDir)
    drain(srcDir, schema, featPath, outPath)
    assert(VersionedTable.read(spark, outPath)
      .filter($"event_id" === 202L).head.getAs[Double]("score") == 30.0,
      "post-optimize batch must serve identical features")

    // RETENTION between ticks: expired history must stop being servable
    VersionedTable.deleteRange(spark, featPath, "fts",
      Long.MinValue, micros("2024-01-03 00:00:00") - 1)
    Seq((203L, 2L, ts("2024-01-04 00:00:00")),
      (204L, 1L, ts("2024-01-04 00:00:00"))).toDF("event_id", "k", "ets")
      .coalesce(1).write.mode("append").parquet(srcDir)
    drain(srcDir, schema, featPath, outPath)
    val out3 = VersionedTable.read(spark, outPath)
    assert(out3.filter($"event_id" === 203L).select($"score").head.isNullAt(0),
      "expired feature history must no longer serve")
    assert(out3.filter($"event_id" === 204L).head.getAs[Double]("score") == 30.0,
      "unexpired rows keep serving")
  }

  test("maxStaleness bounds served freshness in the stream") {
    val srcDir = Files.createTempDirectory("graft_enrich_src2_").toString
    val featPath = Files.createTempDirectory("graft_enrich2_").resolve("features").toString
    val outPath = Files.createTempDirectory("graft_enrich2_").resolve("out").toString
    VersionedTable.overwrite(featPath)(dir => featV1.write.parquet(dir))

    val events = Seq(
      (200L, 1L, ts("2024-01-10 00:00:00")), // latest k=1 is 7d stale → null
      (201L, 1L, ts("2024-01-03 06:00:00"))) // 6h fresh → 30.0
      .toDF("event_id", "k", "ets")
    events.coalesce(1).write.mode("append").parquet(srcDir)
    val q = StreamingEnrich.start(spark, srcDir, events.schema, Seq("k"), "ets",
      featPath, "fts", outPath, maxStaleness = Some("1 day"), availableNow = true)
    q.awaitTermination(120000)

    val out = VersionedTable.read(spark, outPath)
    assert(out.filter($"event_id" === 200L).select($"score").head.isNullAt(0))
    assert(out.filter($"event_id" === 201L).head.getAs[Double]("score") == 30.0)
  }
}
