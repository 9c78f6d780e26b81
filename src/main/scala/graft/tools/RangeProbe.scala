package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin
import graft.pit.AsOfJoin

/** Scale experiments for the round-4 join-plane claims:
  *
  *  1. interval join — bucketed equi-decomposition vs Catalyst's
  *     BroadcastNestedLoopJoin for the same non-equi condition. The naive
  *     plan does |probe|×|intervals| comparisons; the bucketed plan does
  *     |probe| bucket lookups + residual checks on actual candidates.
  *  2. as-of spine-key prefilter — a narrow spine (0.1% of keys) against a
  *     deep history; prefilter on vs off. Off shuffles the WHOLE history by
  *     key; on semi-joins it down to the spine's keys first.
  *
  * Run: tools/run.sh graft.tools.RangeProbe [nProbe] [nIntervals] [nHist]
  */
object RangeProbe {
  def main(args: Array[String]): Unit = {
    val nProbe = if (args.length > 0) args(0).toLong else 20000000L
    val nIntervals = if (args.length > 1) args(1).toLong else 10000L
    val nHist = if (args.length > 2) args(2).toLong else 10000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    // --- 1. interval join: one day of micros, ~10-minute windows ---------
    val day = 86400000000L
    val ivLen = 2L * day / nIntervals // ~2 intervals cover any instant
    val intervals = spark.range(nIntervals).select(
      col("id").as("iv_id"),
      (col("id") * (day / nIntervals)).as("ws"),
      (col("id") * (day / nIntervals) + ivLen).as("we"))
    val probe = spark.range(nProbe).select(
      ((col("id") * 7919L) % day).as("ts"))
    println(s"interval join: probe=$nProbe intervals=$nIntervals (~2 matches/probe)")
    time("bucketed (RangeJoin)") {
      RangeJoin.intervalJoin(probe, "ts", intervals, "ws", "we", ivLen).count()
    }
    // naive non-equi at 1/20 of the probe volume — the BNLJ cost is
    // |probe|×|intervals| and would not finish at full size
    val probeSmall = probe.limit((nProbe / 20).toInt)
    time(s"naive non-equi (1/20 probe)") {
      probeSmall.join(intervals, col("ts") >= col("ws") && col("ts") < col("we")).count()
    }

    // --- 2. as-of spine-key prefilter: narrow spine, deep history --------
    val nKeys = 100000L
    val hist = spark.range(nHist).select(
      (col("id") % nKeys).as("k"),
      timestamp_micros(col("id") * 7919L % day).as("fts"),
      (col("id") % 1000).cast("double").as("f_val"))
    val spine = spark.range(1000L).select(
      col("id").as("sid"),
      (col("id") % 100L).as("k"), // 0.1% of the key space
      timestamp_micros((col("id") * 104729L) % day).as("sts"))
    println(s"as-of prefilter: history=$nHist keys=$nKeys, spine=1000 rows over 100 keys")
    // wall-clock hides the win at toy scale (the whole history fits in page
    // cache); the 100 TB quantity is the bytes that cross the wire — measure
    // shuffle WRITE bytes per arm with a stage listener
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null)
            shuffleBytes.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    def shuffled(name: String)(f: => Long): Unit = {
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val n = f
      Thread.sleep(1000) // listener events drain async; probe-grade wait
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n   shuffleMB=${shuffleBytes.get / 1e6}%.1f")
    }
    // aggregate the joined feature value — a bare count() would let
    // Catalyst prune the window (and its exchange) right out of the plan
    def runAsOf(prefilter: Boolean): Long = {
      val out = AsOfJoin.joinAsOf(spine, hist, Seq("k"), "sts", "fts",
        Seq("f_val"), prefilterSpineKeys = prefilter)
      val row = out.agg(count(lit(1)), sum("f_val")).collect()(0)
      row.getLong(0)
    }
    shuffled("prefilter ON")(runAsOf(true))
    shuffled("prefilter OFF")(runAsOf(false))
    spark.stop()
  }
}
