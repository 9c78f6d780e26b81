package graft.storage

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Transactional table layout for managed feature views — the minimal
  * Delta-shaped commit protocol the reference gets from Snowflake's dynamic
  * tables (SURVEY §1.1 "metadata Delta/parquet table"): a table directory
  * holds immutable parquet *segments* plus one `_MANIFEST.json` whose
  * tmp-write + ATOMIC_MOVE flip is the single commit point.
  *
  *   path/
  *     seg-00000001/ ...parquet (possibly date-partitioned)
  *     seg-00000002/ ...
  *     _MANIFEST.json   {"version":2,"keys":["user_id"],"segments":["seg-00000002"]}
  *
  * Readers resolve the manifest once and only ever see a fully-written
  * committed segment set — there is no delete→rename window where the table
  * is missing (the round-1 swap hazard), and a crashed writer leaves only an
  * unreferenced segment dir behind (cleaned by [[vacuum]]), never a broken
  * table.
  *
  * Three commit kinds:
  *  - [[overwrite]]: manifest := [newSegment] — FULL refresh.
  *  - [[append]]: manifest := segments :+ newSegment — append-mode streams
  *    (each micro-batch lands O(batch) bytes, never rewrites history).
  *  - [[upsert]]: like append, but the manifest carries the key columns and
  *    readers merge-on-read with latest-segment-wins per key — update-mode
  *    streaming aggregations land O(changed keys) per tick. Every
  *    `compactEvery` commits the merged view is rewritten into one segment
  *    (manifest := [compacted]) so read amplification stays bounded — the
  *    LSM/Delta compaction trade.
  *
  * Single writer per table (RefreshManager serializes refreshes); any number
  * of concurrent readers. Dereferenced segments are NOT deleted at commit —
  * an in-flight reader may still hold them — but by an explicit [[vacuum]]
  * with a retention horizon, exactly Delta's VACUUM contract (at 100 TB the
  * horizon would be time-based, e.g. 7 days; here it is "keep the last N
  * segment generations").
  *
  * Scale note: the manifest is O(#segments) driver-side JSON; data files are
  * only ever written once and never renamed, which is also the
  * object-store-safe choice (S3 rename = copy).
  */
object VersionedTable {
  private val ManifestName = "_MANIFEST.json"
  private val SegPrefix = "seg-"
  private val mapper = new ObjectMapper()

  final case class Manifest(version: Long, keys: Seq[String], segments: Seq[String])

  private def manifestPath(path: String): Path = Paths.get(path, ManifestName)

  def readManifest(path: String): Option[Manifest] = {
    val p = manifestPath(path)
    if (!Files.exists(p)) None
    else {
      val n = mapper.readTree(Files.readAllBytes(p))
      Some(Manifest(
        n.get("version").asLong(),
        n.get("keys").elements().asScala.map(_.asText()).toSeq,
        n.get("segments").elements().asScala.map(_.asText()).toSeq))
    }
  }

  private def writeManifest(path: String, m: Manifest): Unit = {
    val n = mapper.createObjectNode()
    n.put("version", m.version)
    val ks = n.putArray("keys"); m.keys.foreach(ks.add)
    val ss = n.putArray("segments"); m.segments.foreach(ss.add)
    Files.createDirectories(Paths.get(path))
    val tmp = Paths.get(path, ManifestName + ".tmp")
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(n))
    Files.move(tmp, manifestPath(path), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** The table exists once a manifest is committed; pre-manifest layouts
    * (plain parquet dirs from older stores) are honored for reads.
    */
  def exists(path: String): Boolean =
    Files.exists(manifestPath(path)) || legacyExists(path)

  private def legacyExists(path: String): Boolean = {
    val d = new java.io.File(path)
    d.isDirectory && d.listFiles() != null && d.listFiles().exists(f =>
      f.getName.endsWith(".parquet") || f.getName.startsWith("_graft_date=") ||
        f.getName == "_SUCCESS")
  }

  private def segDir(path: String, name: String): String =
    Paths.get(path, name).toString

  /** Committed merged view of the table. Plain union for overwrite/append
    * tables; for keyed (upsert) tables, latest-segment-wins per key — the
    * merge-on-read side of the upsert commit.
    */
  def read(spark: SparkSession, path: String): DataFrame = readManifest(path) match {
    case None =>
      spark.read.parquet(path) // legacy plain-parquet table
    case Some(m) =>
      require(m.segments.nonEmpty, s"empty manifest at $path")
      val SegCol = "__graft_seg"
      // allowMissingColumns: an all-empty segment is written unpartitioned
      // (no _graft_date column) while data segments are partitioned
      def union(dfs: Seq[DataFrame]): DataFrame =
        dfs.reduce(_.unionByName(_, allowMissingColumns = true))
      if (m.keys.isEmpty || m.segments.size == 1) {
        union(m.segments.map(s => spark.read.parquet(segDir(path, s))))
      } else {
        val tagged = m.segments.zipWithIndex.map { case (s, i) =>
          spark.read.parquet(segDir(path, s)).withColumn(SegCol, lit(i))
        }
        val w = Window.partitionBy(m.keys.map(col): _*).orderBy(col(SegCol).desc)
        union(tagged)
          .withColumn("__graft_rn", row_number().over(w))
          .filter(col("__graft_rn") === 1)
          .drop(SegCol, "__graft_rn")
      }
  }

  private def nextSeg(path: String, m: Option[Manifest]): (String, Long) = {
    val v = m.map(_.version).getOrElse(0L) + 1
    (f"$SegPrefix$v%08d", v)
  }

  /** FULL publish: write one fresh segment, point the manifest at it alone. */
  def overwrite(path: String)(writeSeg: String => Unit): Unit = {
    val m = readManifest(path)
    val (seg, v) = nextSeg(path, m)
    writeSeg(segDir(path, seg))
    writeManifest(path, Manifest(v, Seq.empty, Seq(seg)))
  }

  /** Append publish: the new segment joins the committed set (O(batch)). */
  def append(path: String)(writeSeg: String => Unit): Unit = {
    val m = readManifest(path)
    val (seg, v) = nextSeg(path, m)
    writeSeg(segDir(path, seg))
    writeManifest(path, Manifest(v, Seq.empty, m.map(_.segments).getOrElse(Seq.empty) :+ seg))
  }

  /** Upsert publish: new segment's rows supersede older rows with the same
    * `keys` tuple at read time. Rewrites the merged view into a single
    * segment every `compactEvery` commits via `compactWrite`.
    */
  def upsert(
      spark: SparkSession,
      path: String,
      keys: Seq[String],
      compactEvery: Int = 8,
      compactWrite: (DataFrame, String) => Unit)(writeSeg: String => Unit): Unit = {
    val m = readManifest(path)
    m.foreach(prev => require(prev.keys.isEmpty || prev.keys == keys,
      s"upsert keys $keys do not match table keys ${prev.keys} at $path"))
    val (seg, v) = nextSeg(path, m)
    writeSeg(segDir(path, seg))
    val appended = Manifest(v, keys, m.map(_.segments).getOrElse(Seq.empty) :+ seg)
    writeManifest(path, appended)
    if (appended.segments.size >= compactEvery) {
      val merged = read(spark, path) // resolves the manifest just committed
      val (cseg, cv) = nextSeg(path, Some(appended))
      compactWrite(merged, segDir(path, cseg))
      writeManifest(path, Manifest(cv, keys, Seq(cseg)))
    }
  }

  /** Delete unreferenced segments older than `keepGenerations` manifest
    * versions — Delta VACUUM semantics: safe as long as no reader holds a
    * manifest that many commits stale.
    */
  def vacuum(path: String, keepGenerations: Int = 8): Int = {
    readManifest(path) match {
      case None => 0
      case Some(m) =>
        val referenced = m.segments.toSet
        val horizon = m.version - keepGenerations
        val dir = new java.io.File(path)
        val victims = Option(dir.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isDirectory && f.getName.startsWith(SegPrefix))
          .filterNot(f => referenced.contains(f.getName))
          .filter { f =>
            val idx = scala.util.Try(f.getName.stripPrefix(SegPrefix).toLong).getOrElse(Long.MaxValue)
            idx <= horizon
          }
        victims.foreach(f => deleteRecursively(f.toPath))
        victims.length
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toSeq.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
