package graft.storage

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.SparkSession

/** One-way bridge from [[VersionedTable]]'s manifest format to a
  * Delta-Lake-readable directory layout — the interop answer to
  * "storage should be Delta/Iceberg": the Delta jars are unavailable in
  * this offline sandbox, so the bridge emits the OPEN, DOCUMENTED commit
  * format (delta.io PROTOCOL.md: a `_delta_log/` of newline-delimited
  * JSON actions next to plain parquet) rather than linking the library.
  * A Delta reader opens the export as version 0 of a table; a plain
  * parquet reader sees the same rows (underscore-prefixed `_delta_log`
  * is hidden from Spark's file index by convention).
  *
  * Export rules:
  *  - keyless (full/append) tables: data files are HARD-COPIED as-is,
  *    one per committed segment file — no recompute, no rewrite; at
  *    scale this is a metadata operation plus byte copies that an
  *    object store performs server-side.
  *  - keyed (upsert) tables: Delta has no analogue of this table's
  *    latest-segment-wins merge-on-read, so the MERGED view is
  *    materialized once (the same rows every [[VersionedTable.read]]
  *    would serve) and exported as a fresh snapshot.
  *
  * The log carries the three mandatory actions of a first commit —
  * `protocol` (minReader 1 / minWriter 2), `metaData` (the Spark
  * schema-JSON string Delta uses verbatim, parquet format, no
  * partition columns), and one `add` per data file with its real size
  * and `dataChange: true` — which is exactly what a v0 Delta snapshot
  * needs to be scannable.
  */
object DeltaInterop {

  private val mapper = new ObjectMapper()

  /** Export the committed snapshot at `tablePath` into `outDir` (created;
    * must not already contain a `_delta_log`). Returns the relative paths
    * of the exported data files, in `add`-action order.
    */
  def exportSnapshot(
      spark: SparkSession, tablePath: String, outDir: String): Seq[String] = {
    val out = Paths.get(outDir)
    Files.createDirectories(out)
    require(!Files.exists(out.resolve("_delta_log")),
      s"$outDir already holds a _delta_log — refusing to overwrite a Delta table")
    val m = VersionedTable.readManifest(tablePath).getOrElse(
      throw new NoSuchElementException(s"no committed manifest at $tablePath"))

    val schemaJson = VersionedTable.read(spark, tablePath).schema.json

    // verbatim copy requires flat segments: a hive-partitioned segment
    // (e.g. writeShards' pb=/ps= shard dirs) keeps column values in its
    // DIRECTORY names, which a flat copy would silently drop — those
    // tables take the materialize path, where the read restores the
    // partition columns as data
    val flat = m.segments.forall(seg => !hasSubdirs(Paths.get(tablePath, seg)))

    val dataFiles: Seq[Path] =
      if (m.keys.isEmpty && flat) {
        // copy committed segment files verbatim, names prefixed by their
        // segment so two segments' part files never collide
        for {
          seg <- m.segments
          f <- listParquet(Paths.get(tablePath, seg))
        } yield {
          val dst = out.resolve(s"$seg-${f.getFileName}")
          Files.copy(f, dst, StandardCopyOption.REPLACE_EXISTING)
          dst
        }
      } else {
        // materialize the committed view once: keyed segments need the
        // latest-wins merge Delta cannot express, partitioned segments
        // need their directory-encoded columns restored as data
        val tmp = Files.createTempDirectory("graft_delta_merge_")
        VersionedTable.read(spark, tablePath)
          .write.mode("overwrite").parquet(tmp.toString)
        for (f <- listParquet(tmp)) yield {
          val dst = out.resolve(f.getFileName.toString)
          Files.move(f, dst, StandardCopyOption.REPLACE_EXISTING)
          dst
        }
      }

    val logDir = out.resolve("_delta_log")
    Files.createDirectories(logDir)
    val now = System.currentTimeMillis()
    val actions = Seq(
      {
        val n = mapper.createObjectNode()
        val p = n.putObject("protocol")
        p.put("minReaderVersion", 1); p.put("minWriterVersion", 2)
        n
      },
      {
        val n = mapper.createObjectNode()
        val md = n.putObject("metaData")
        md.put("id", java.util.UUID.randomUUID().toString)
        val fmt = md.putObject("format")
        fmt.put("provider", "parquet"); fmt.putObject("options")
        md.put("schemaString", schemaJson)
        md.putArray("partitionColumns")
        md.putObject("configuration")
        md.put("createdTime", now)
        n
      }) ++ dataFiles.map { f =>
      val n = mapper.createObjectNode()
      val add = n.putObject("add")
      add.put("path", out.relativize(f).toString)
      add.putObject("partitionValues")
      add.put("size", Files.size(f))
      add.put("modificationTime", now)
      add.put("dataChange", true)
      n
    }
    val log = actions.map(mapper.writeValueAsString).mkString("", "\n", "\n")
    val commit = logDir.resolve("00000000000000000000.json")
    Files.write(commit, log.getBytes("UTF-8"))
    dataFiles.map(f => out.relativize(f).toString)
  }

  private def hasSubdirs(dir: Path): Boolean = {
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.exists(Files.isDirectory(_))
    } finally s.close()
  }

  private def listParquet(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_")
      }.toSeq.sortBy(_.getFileName.toString)
    } finally s.close()
  }
}
