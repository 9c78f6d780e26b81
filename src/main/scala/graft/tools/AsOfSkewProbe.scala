package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pit.AsOfJoin

/** Hot-key skew probe for the as-of join (VERDICT r7 task #1 done-criterion):
  * one key owns 50% of a synthetic history+spine corpus, so under plain
  * union-window its entire timeline sorts in ONE window task (AQE cannot
  * split window partitions) and that task bounds wall-clock. The probe runs
  * union-window and salted-window on the same corpus, records wall time and
  * the LONGEST single task of each run (a straggler detector), and writes
  * one JSON line to stdout + ASOFPROBE_r09.json (override via GRAFT_PROBE_OUT). The salted run must show
  * the max task no longer dominating its wall time.
  *
  * Usage: tools/run.sh graft.tools.AsOfSkewProbe [nFeatures nSpine nKeys]
  */
object AsOfSkewProbe {
  def main(args: Array[String]): Unit = {
    val nFeatures = if (args.length > 0) args(0).toLong else 16000000L
    val nSpine = if (args.length > 1) args(1).toLong else 1600000L
    val nKeys = if (args.length > 2) args(2).toLong else 50000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 50% of both sides on key 0 (the verdict's skew shape); the rest
    // uniform. Hot-key union count ≈ nFeatures/2 + nSpine/2, which clears
    // the DEFAULT 2M hot threshold at the default corpus size — the probe
    // exercises production defaults, not test-tuned ones.
    val hot = (c: org.apache.spark.sql.Column) =>
      when(c % 2 === 0, lit(0L)).otherwise(c % nKeys)
    val features = spark.range(nFeatures).select(
      hot(col("id")).as("k"),
      timestamp_micros(col("id") * 7919L * 1361L % 86400000000L).as("fts"),
      (col("id") % 1000).cast("double").as("f_val"))
    val spine = spark.range(nSpine).select(
      col("id").as("sid"),
      hot(col("id")).as("k"),
      timestamp_micros((col("id") * 104729L) % 86400000000L).as("sts"))

    val maxTaskMs = new AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        maxTaskMs.getAndUpdate(m => math.max(m, t.taskInfo.duration))
    }
    spark.sparkContext.addSparkListener(listener)

    def measure(method: String): (Double, Double, Long) = {
      maxTaskMs.set(0)
      val t0 = System.nanoTime()
      val n = AsOfJoin.joinAsOf(spine, features, Seq("k"), "sts", "fts",
        Seq("f_val"), method = method).agg(count(col("f_val"))).head.getLong(0)
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; settle before reading the max
      Thread.sleep(1500)
      (wall, maxTaskMs.get / 1e3, n)
    }

    if (sys.env.contains("SPARK_GRAFT_DUMP_PLAN")) {
      val df = AsOfJoin.joinAsOf(spine, features, Seq("k"), "sts", "fts",
        Seq("f_val"), method = "salted-window")
      df.count()
      val plan = df.queryExecution.executedPlan.toString
      println("Exchange: " + "Exchange hashpartitioning".r.findAllIn(plan).size)
      println("ReusedExchange: " + "ReusedExchange".r.findAllIn(plan).size)
      println("Range scans: " + "Range \\(".r.findAllIn(plan).size)
      println("Window nodes: " + "Window \\[".r.findAllIn(plan).size)
      println(plan)
      spark.stop(); return
    }

    // Multi-FV shared window on the same skewed corpus: a second feature
    // view (different payload, same hot key distribution) rides the one
    // shuffle; the strategy is routed via the session conf exactly as
    // generateDataset routes it.
    val features2 = spark.range(nFeatures / 2).select(
      hot(col("id")).as("k"),
      timestamp_micros(col("id") * 6007L * 911L % 86400000000L).as("fts2"),
      (col("id") % 997).cast("double").as("g_val"))
    def measureMulti(method: String): (Double, Double, Long) = {
      maxTaskMs.set(0)
      spark.conf.set("graft.asof.method", method)
      val t0 = System.nanoTime()
      val n = try AsOfJoin.joinAsOfMulti(spine,
          Seq((features, "fts", Seq("f_val")), (features2, "fts2", Seq("g_val"))),
          Seq("k"), "sts")
          .agg(count(col("f_val")) + count(col("g_val"))).head.getLong(0)
        finally spark.conf.unset("graft.asof.method")
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)
      (wall, maxTaskMs.get / 1e3, n)
    }

    measure("union-window") // warm-up: JIT + parquet-free codegen paths
    val runs = Seq("union-window", "salted-window").map { m =>
      val (wall, maxTask, rows) = measure(m)
      println(f"$m%-15s wall=$wall%7.2f s  max_task=$maxTask%7.2f s  rows=$rows")
      m -> (wall, maxTask, rows)
    }.toMap
    measureMulti("union-window") // warm-up: multi-tagged plan shape JIT
    val multiRuns = Seq("union-window", "salted-window").map { m =>
      val (wall, maxTask, rows) = measureMulti(m)
      println(f"multi/$m%-15s wall=$wall%7.2f s  max_task=$maxTask%7.2f s  rows=$rows")
      m -> (wall, maxTask, rows)
    }.toMap

    val (uw, st) = (runs("union-window"), runs("salted-window"))
    require(uw._3 == st._3, s"row-count mismatch: union=${uw._3} salted=${st._3}")
    val (muw, mst) = (multiRuns("union-window"), multiRuns("salted-window"))
    require(muw._3 == mst._3, s"multi row-count mismatch: union=${muw._3} salted=${mst._3}")
    val json =
      f"""{"corpus":{"features":$nFeatures,"spine":$nSpine,"keys":$nKeys,"hot_share":0.5},""" +
      f""""union_window":{"wall_sec":${r4(uw._1)},"max_task_sec":${r4(uw._2)}},""" +
      f""""salted_window":{"wall_sec":${r4(st._1)},"max_task_sec":${r4(st._2)}},""" +
      f""""rows":${uw._3},"max_task_ratio":${r4(st._2 / math.max(uw._2, 1e-9))},""" +
      f""""multi_fv":{"fv2_features":${nFeatures / 2},""" +
      f""""union_window":{"wall_sec":${r4(muw._1)},"max_task_sec":${r4(muw._2)}},""" +
      f""""salted_window":{"wall_sec":${r4(mst._1)},"max_task_sec":${r4(mst._2)}},""" +
      f""""rows":${muw._3},"max_task_ratio":${r4(mst._2 / math.max(muw._2, 1e-9))}}}"""
    println(json)
    Files.write(
      Paths.get(sys.env.getOrElse("GRAFT_PROBE_OUT", "/root/repo/ASOFPROBE_r09.json")),
      json.getBytes(StandardCharsets.UTF_8))
    spark.stop()
  }

  private def r4(d: Double): Double = math.rint(d * 1e4) / 1e4
}
