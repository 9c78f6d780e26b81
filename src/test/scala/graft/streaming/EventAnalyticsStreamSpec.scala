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
}
