package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.storage.{VersionedTable, ZOrderLayout}

/** Read-amplification evidence for `VersionedTable.optimize` (round-10
  * feature): a streaming sink accumulating micro-batch segments pays for
  * them on EVERY read — per-relation listing/planning, tiny parquet files,
  * and a union plan as wide as the segment count — until compaction folds
  * them into few right-sized files. This probe builds an append table from
  * the events corpus landed as `segments` micro-batches (disjoint time
  * slices, per-segment stats), then measures, at 1× and 10× corpus scale:
  *
  *   - full-scan wall + file count before vs after optimize;
  *   - a (user × time) box-filter scan wall + executor-truth input bytes
  *     before vs after a 2-dim Z-ORDER optimize (footer-stats pruning only
  *     helps when the layout makes files LOCAL in both dimensions);
  *   - time-range read (`readRange`) segment pruning before vs after
  *     (refolded stats must keep manifest-level skipping working).
  *
  * Usage: tools/run.sh graft.tools.OptimizeProbe [sfDir]
  *        → OPTPROBE_r10.json (override via GRAFT_PROBE_OUT)
  */
object OptimizeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = sys.env.getOrElse("GRAFT_PROBE_OUT", "/root/repo/OPTPROBE_r10.json")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val inBytes = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) inBytes.addAndGet(m.inputMetrics.bytesRead)
      }
    })
    def measured[A](body: => A): (A, Double, Long) = {
      Thread.sleep(300) // let the async listener bus drain the previous job
      inBytes.set(0)
      val t0 = System.nanoTime()
      val r = body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      (r, wall, inBytes.get())
    }
    // parquet files in the LIVE manifest segments only (old generations
    // linger until vacuum retention expires them; readers never touch them)
    def countFiles(dir: String): Long = {
      def filesIn(d: java.nio.file.Path): Long =
        if (!Files.exists(d)) 0L
        else {
          val s = Files.walk(d)
          try s.filter(p => p.toString.endsWith(".parquet")).count()
          finally s.close()
        }
      VersionedTable.readManifest(dir) match {
        case Some(m) => m.segments.map(s => filesIn(Paths.get(dir, s))).sum
        case None => filesIn(Paths.get(dir))
      }
    }

    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("value"))

    val cells = Seq(1, 10).map { scale =>
      // disjoint 10x: per-copy user-id offset (the ScaleSweep shape)
      val data = (0 until scale).map(k =>
        ev.withColumn("user_id", col("user_id") + lit(k * 10000L)))
        .reduce(_ unionByName _)
        .persist()
      val total = data.count()
      val stats = data.agg(
        min(col("user_id")), max(col("user_id")),
        min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head
      val (u0, u1) = (stats.getLong(0), stats.getLong(1))
      val (t0us, t1us) = (stats.getLong(2), stats.getLong(3))

      // land as `segments` micro-batches on disjoint time slices, each with
      // event-time stats — exactly the shape an INCREMENTAL append sink leaves
      val segments = 64
      val path = Files.createTempDirectory(s"graft_optprobe_${scale}x_").toString
      (0 until segments).foreach { i =>
        val lo = t0us + (t1us - t0us + 1) * i / segments
        val hi = t0us + (t1us - t0us + 1) * (i + 1) / segments - 1
        val slice = data.filter(unix_micros(col("ts")).between(lo, hi))
        VersionedTable.append(path,
          stats = Some(VersionedTable.SegStats("ts", lo, hi)))(
          d => slice.coalesce(1).write.parquet(d))
      }

      val filesBefore = countFiles(path)
      val (_, scanWallBefore, scanBytesBefore) =
        measured(VersionedTable.read(spark, path).count())
      // box filter: central 1/8 of users x central 1/8 of time
      val (bu0, bu1) = (u0 + (u1 - u0) * 7 / 16, u0 + (u1 - u0) * 9 / 16)
      val (bt0, bt1) = (t0us + (t1us - t0us) * 7 / 16, t0us + (t1us - t0us) * 9 / 16)
      def boxCount(): Long = VersionedTable.read(spark, path)
        .filter(col("user_id").between(bu0, bu1) &&
          unix_micros(col("ts")).between(bt0, bt1)).count()
      val (boxRows, boxWallBefore, boxBytesBefore) = measured(boxCount())
      val (kb, _) = VersionedTable.segmentsInRange(path, "ts", bt0, bt1)
      val rangeSegsBefore = kb.size

      val (_, optimizeWall, _) = measured(
        VersionedTable.optimize(spark, path, numFiles = 32,
          zorderBy = Seq("user_id", "ts"), statsCol = Some("ts")))

      val filesAfter = countFiles(path)
      val (_, scanWallAfter, scanBytesAfter) =
        measured(VersionedTable.read(spark, path).count())
      val (boxRowsAfter, boxWallAfter, boxBytesAfter) = measured(boxCount())
      require(boxRowsAfter == boxRows, s"optimize changed box result: $boxRows -> $boxRowsAfter")
      val (ka, _) = VersionedTable.segmentsInRange(path, "ts", bt0, bt1)
      // z-layout locality evidence independent of scan internals: how many
      // FILES the box envelope-intersects after clustering
      val m = VersionedTable.readManifest(path).get
      val env = ZOrderLayout.collectEnvelopes(spark,
        Paths.get(path, m.segments.head).toString, "user_id", "ts")
      val envHits = ZOrderLayout.boxHits(env,
        bu0, bu1, bt0 / 1000000L, bt1 / 1000000L) // ts casts to epoch-seconds long

      data.unpersist()
      f"""{"scale":$scale,"rows":$total,"segments_before":$segments,""" +
      f""""files_before":$filesBefore,"files_after":$filesAfter,""" +
      f""""scan_wall_before_s":$scanWallBefore%.3f,"scan_wall_after_s":$scanWallAfter%.3f,""" +
      f""""scan_bytes_before":$scanBytesBefore,"scan_bytes_after":$scanBytesAfter,""" +
      f""""box_rows":$boxRows,"box_wall_before_s":$boxWallBefore%.3f,"box_wall_after_s":$boxWallAfter%.3f,""" +
      f""""box_bytes_before":$boxBytesBefore,"box_bytes_after":$boxBytesAfter,""" +
      f""""range_segments_scanned_before":$rangeSegsBefore,"range_segments_scanned_after":${ka.size},""" +
      f""""box_envelope_files_hit":$envHits,"files_total":${env.length},""" +
      f""""optimize_wall_s":$optimizeWall%.3f}"""
    }

    val json = s"""{"sf":"$sfDir","corpus":${graft.CorpusFingerprint.json(spark, sfDir)},""" +
      s""""cells":[${cells.mkString(",")}]}"""
    println(json)
    Files.write(Paths.get(out), (json + "\n").getBytes(StandardCharsets.UTF_8))
    spark.stop()
  }
}
