package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.EventAnalytics

/** Incremental event-analytics maintenance: after EVERY wave the served
  * funnel/retention must equal the batch operators over everything
  * ingested so far — under out-of-order arrival (late waves carry
  * earlier timestamps, forcing t₁ to decrease and the candidate pruning
  * bound to tighten), and with replayed micro-batches skipped by the
  * batchId guard (exactly-once).
  */
class EventAnalyticsStreamSpec extends SparkSpec {
  import spark.implicits._

  private val types = Seq("view", "click", "purchase")
  private val win = 4L * 3600 * 1000000

  private def mkEvents(rows: Seq[(Long, Long, String, Long)]): DataFrame =
    rows.toDF("event_id", "user_id", "event_type", "us")
      .select(col("event_id"), col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"))

  private def funnelMap(df: DataFrame): Map[Long, (Seq[Option[Long]], Int)] =
    df.collect().map { r =>
      r.getAs[Long]("user_id") ->
        ((1 to 3).map(i => Option(r.get(r.fieldIndex(s"t${i}_us")))
          .map(_.asInstanceOf[Long])),
          r.getAs[Int]("reached"))
    }.toMap

  private def retMap(df: DataFrame): Map[(String, Long), Long] =
    df.collect().map(r => (r.getDate(0).toString, r.getAs[Long]("week_offset")) ->
      r.getAs[Long]("n_users")).toMap

  private def randomEvents(seed: Int, n: Int, users: Int): Seq[(Long, Long, String, Long)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, rnd.nextInt(users).toLong,
      types(rnd.nextInt(3)), rnd.nextInt(100000).toLong * 1000000L))
  }

  test("stream ≡ batch after every wave, out-of-order arrival included; replay is a no-op") {
    val all = randomEvents(99, 1200, 30)
    // waves split by event id, NOT by time: a later wave routinely carries
    // the earliest timestamp a user has seen — the t1-decrease case
    val waves = (0 until 4).map(w => all.filter(_._1 % 4 == w))
    val root = Files.createTempDirectory("graft_eas_").toString
    val (fPath, rPath) = (root + "/funnel", root + "/retention")
    var ingested = Seq.empty[(Long, Long, String, Long)]
    waves.zipWithIndex.foreach { case (evs, w) =>
      ingested ++= evs
      EventAnalyticsStream.funnelMaintain(
        spark, fPath, mkEvents(evs), types, win, Some(w.toLong))
      EventAnalyticsStream.retentionMaintain(
        spark, rPath, mkEvents(evs), Some(w.toLong))
      val wantF = funnelMap(EventAnalytics.funnel(mkEvents(ingested), types, win))
      val gotF = funnelMap(EventAnalyticsStream.funnelServe(spark, fPath, 3))
      assert(gotF == wantF, s"wave $w: funnel diverged from batch")
      val wantR = retMap(EventAnalytics.retentionCohorts(mkEvents(ingested)))
      val gotR = retMap(EventAnalyticsStream.retentionServe(spark, rPath))
      assert(gotR == wantR, s"wave $w: retention diverged from batch")
    }
    // replay guard: wave 3's batchId redelivered with DIFFERENT rows must
    // be skipped entirely — state unchanged
    val before = funnelMap(EventAnalyticsStream.funnelServe(spark, fPath, 3))
    val beforeR = retMap(EventAnalyticsStream.retentionServe(spark, rPath))
    val poison = Seq((9999L, 1L, "view", 1000000L))
    EventAnalyticsStream.funnelMaintain(
      spark, fPath, mkEvents(poison), types, win, Some(3L))
    EventAnalyticsStream.retentionMaintain(
      spark, rPath, mkEvents(poison), Some(3L))
    assert(funnelMap(EventAnalyticsStream.funnelServe(spark, fPath, 3)) == before)
    assert(retMap(EventAnalyticsStream.retentionServe(spark, rPath)) == beforeR)
  }

  test("late earlier step-1 event re-qualifies a previously-disqualified chain") {
    val root = Files.createTempDirectory("graft_eas_late_").toString
    val fPath = root + "/funnel"
    val h = 3600L * 1000000
    // wave 0: view at t=10h, click at t=2h (BEFORE the anchor -> no step 2)
    EventAnalyticsStream.funnelMaintain(spark, fPath, mkEvents(Seq(
      (1L, 7L, "view", 10 * h), (2L, 7L, "click", 2 * h))), types, win, Some(0L))
    assert(funnelMap(EventAnalyticsStream.funnelServe(spark, fPath, 3))(7L)._2 == 1)
    // wave 1: a LATE view at t=1h — the anchor drops to 1h, the old click
    // (2h <= 1h + 4h) must now qualify from retained candidate state
    EventAnalyticsStream.funnelMaintain(spark, fPath, mkEvents(Seq(
      (3L, 7L, "view", 1 * h))), types, win, Some(1L))
    val got = funnelMap(EventAnalyticsStream.funnelServe(spark, fPath, 3))(7L)
    assert(got._1(0).contains(1 * h) && got._1(1).contains(2 * h) && got._2 == 2,
      s"got $got")
  }

  test("availableNow stream drains waves through foreachBatch, final state ≡ batch") {
    val all = randomEvents(123, 800, 20)
    val root = Files.createTempDirectory("graft_eas_stream_").toString
    val src = root + "/src"
    (0 until 4).foreach { w =>
      mkEvents(all.filter(_._1 % 4 == w)).coalesce(1)
        .write.mode("append").parquet(src)
    }
    val schema = mkEvents(all.take(1)).schema
    val q = EventAnalyticsStream.start(spark, src, schema, types, win,
      root + "/funnel", root + "/retention",
      availableNow = true, maxFilesPerTrigger = Some(1))
    q.awaitTermination(120000)
    val wantF = funnelMap(EventAnalytics.funnel(mkEvents(all), types, win))
    val gotF = funnelMap(EventAnalyticsStream.funnelServe(spark, root + "/funnel", 3))
    assert(gotF == wantF)
    val wantR = retMap(EventAnalytics.retentionCohorts(mkEvents(all)))
    val gotR = retMap(EventAnalyticsStream.retentionServe(spark, root + "/retention"))
    assert(gotR == wantR)
  }

  test("gapFill: stream ≡ batch after every out-of-order wave; replay is a no-op") {
    import scala.util.Random
    val rnd = new Random(77)
    // events with VALUE (nullable — a NULL value never defines a day)
    val rows = (0 until 600).map { i =>
      val u = rnd.nextInt(12).toLong
      val day = rnd.nextInt(20).toLong
      val v: java.lang.Double =
        if (rnd.nextInt(7) == 0) null else rnd.nextInt(10000) / 100.0
      (i.toLong, u, 86400000000L * day + rnd.nextInt(86400) * 1000000L, v)
    }
    def mk(rs: Seq[(Long, Long, Long, java.lang.Double)]) =
      rs.toDF("event_id", "user_id", "us", "value")
        .select(col("event_id"), col("user_id"),
          timestamp_micros(col("us")).as("ts"), col("value"))
    def gfMap(df: DataFrame) = df.collect().map { r =>
      (r.getLong(0), r.getDate(1).toString) ->
        ((if (r.isNullAt(2)) None else Some(r.getLong(2))), r.getBoolean(3))
    }.toMap
    val statePath = Files.createTempDirectory("graft_gf_").toString + "/state"
    // wave key = event_id % 3: arrival order ≠ time order (late waves
    // back-date spans and re-define earlier days by higher event_id)
    val seen = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, java.lang.Double)]
    (0 until 3).foreach { w =>
      val wave = rows.filter(_._1 % 3 == w)
      seen ++= wave
      EventAnalyticsStream.gapFillMaintain(spark, statePath, mk(wave.toSeq),
        Some(w.toLong))
      val got = gfMap(EventAnalyticsStream.gapFillServe(spark, statePath))
      val want = gfMap(EventAnalytics.gapFillDaily(mk(seen.toSeq)))
      assert(got == want, s"wave $w diverged from batch")
    }
    // replayed batchId is a no-op (exactly-once)
    EventAnalyticsStream.gapFillMaintain(spark, statePath,
      mk(rows.filter(_._1 % 3 == 2)), Some(2L))
    assert(gfMap(EventAnalyticsStream.gapFillServe(spark, statePath))
      == gfMap(EventAnalytics.gapFillDaily(mk(rows))))
  }

  test("funnelMaintain refuses duplicate step names (stream would diverge from batch)") {
    // batch funnel matches an event type at EVERY step holding it; the
    // incremental state keys each event to ONE step index — the repeated-
    // step shape cannot be maintained faithfully, so it refuses loudly
    // (ADVICE r15) instead of silently diverging.
    val root = Files.createTempDirectory("graft_eas_dup_").toString
    val batch = mkEvents(Seq((1L, 1L, "view", 1000L), (2L, 1L, "view", 2000L),
      (3L, 1L, "purchase", 3000L)))
    val e = intercept[IllegalArgumentException] {
      EventAnalyticsStream.funnelMaintain(spark, root + "/funnel", batch,
        Seq("view", "view", "purchase"), windowUs = 10000000L)
    }
    assert(e.getMessage.contains("duplicate step names"))
  }
}
