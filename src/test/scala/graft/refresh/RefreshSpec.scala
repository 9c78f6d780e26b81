package graft.refresh

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.core.FeatureStore
import graft.model._

/** Managed-refresh plane (SURVEY §2.C): FULL refresh ticks, INCREMENTAL via
  * Structured Streaming (AvailableNow for deterministic tests), and the
  * refresh-status surface.
  */
class RefreshSpec extends SparkSpec {

  private def freshStore(): FeatureStore =
    FeatureStore(spark, Files.createTempDirectory("graft_refresh_test_").toString)

  test("refreshOnce (FULL) picks up new source data atomically") {
    val fs = freshStore()
    val srcDir = Files.createTempDirectory("graft_src_").toString
    Tables.events(spark, sfDir).limit(100).write.mode("overwrite").parquet(srcDir)
    spark.read.parquet(srcDir).createOrReplaceTempView("stream_src")
    fs.registerEntity(Entity("user", Seq("user_id")))
    val fv = FeatureView("fv_full", Seq(Entity("user", Seq("user_id"))),
      "SELECT user_id, count(*) AS f_n FROM stream_src GROUP BY user_id",
      refresh = Some(RefreshConfig("1 minute", RefreshMode.Full)))
    fs.registerFeatureView(fv, "1")
    val before = fs.readFeatureView("fv_full", "1").agg(sum("f_n")).collect()(0).getLong(0)
    assert(before == 100)
    // append more source data, re-point the view, tick once
    Tables.events(spark, sfDir).limit(300).write.mode("overwrite").parquet(srcDir)
    spark.read.parquet(srcDir).createOrReplaceTempView("stream_src")
    val mgr = new RefreshManager(fs)
    mgr.refreshOnce(fs.getFeatureView("fv_full", "1"))
    val after = fs.readFeatureView("fv_full", "1").agg(sum("f_n")).collect()(0).getLong(0)
    assert(after == 300)
  }

  test("INCREMENTAL (AvailableNow) streams an aggregation into the FV table") {
    val fs = freshStore()
    val srcDir = Files.createTempDirectory("graft_src_inc_").toString
    val ev = Tables.events(spark, sfDir)
    ev.limit(200).write.mode("overwrite").parquet(srcDir)
    // register with a query over the *streaming* temp view name
    spark.read.parquet(srcDir).createOrReplaceTempView("inc_src")
    fs.registerEntity(Entity("user", Seq("user_id")))
    val fv = FeatureView("fv_inc", Seq(Entity("user", Seq("user_id"))),
      "SELECT user_id, count(*) AS f_n FROM inc_src GROUP BY user_id",
      refresh = Some(RefreshConfig("1 minute", RefreshMode.Incremental,
        InitializeMode.OnSchedule)))
    fs.registerFeatureView(fv, "1")
    val mgr = new RefreshManager(fs)
    val rec = fs.getFeatureView("fv_inc", "1")
    val q = mgr.startIncremental(rec, "inc_src", srcDir, ev.schema, availableNow = true)
    q.awaitTermination(120000)
    val out = fs.readFeatureView("fv_inc", "1")
    assert(out.agg(sum("f_n")).collect()(0).getLong(0) == 200)
    assert(mgr.status(rec).startsWith("INCREMENTAL"))
    mgr.stopAll()
  }

  test("status is IDLE before any refresh is scheduled") {
    val fs = freshStore()
    Tables.events(spark, sfDir).createOrReplaceTempView("ev_src2")
    fs.registerEntity(Entity("user", Seq("user_id")))
    val fv = FeatureView("fv_idle", Seq(Entity("user", Seq("user_id"))),
      "SELECT user_id, count(*) AS f_n FROM ev_src2 GROUP BY user_id",
      refresh = Some(RefreshConfig("1 minute")))
    fs.registerFeatureView(fv, "1")
    val mgr = new RefreshManager(fs)
    assert(mgr.status(fs.getFeatureView("fv_idle", "1")) == "IDLE")
  }

  test("refresh duration strings parse (reference target_lag values)") {
    assert(RefreshConfig.parseDurationMillis("1 minute") == 60000L)
    assert(RefreshConfig.parseDurationMillis("5 minutes") == 300000L)
    assert(RefreshConfig.parseDurationMillis("1 hour") == 3600000L)
    intercept[IllegalArgumentException] { RefreshConfig.parseDurationMillis("whenever") }
  }
}
