package graft.storage

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.SparkSession

/** Two-way bridge between [[VersionedTable]]'s manifest format and a
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

  /** Import a Delta-format directory (the inverse bridge): load the base
    * state from the latest parquet CHECKPOINT when `_last_checkpoint`
    * points at one (real Delta tables checkpoint every ~10 commits — a
    * reader that refuses checkpoints reads only toy tables), then replay
    * the commit-JSON TAIL in version order — `metaData` last-wins, `add`
    * activates a file, `remove` retires it (last action per path wins) —
    * and serve the active file set as a DataFrame with the log-declared
    * schema. Single-file and multi-part (`parts` in `_last_checkpoint`)
    * checkpoints are both read; a gap in the tail's version sequence
    * refuses loudly (a missing commit silently time-travels the table).
    * `remove` rows inside a checkpoint are vacuum tombstones, not state —
    * they are ignored (the active set is exactly the checkpoint's `add`
    * rows, per delta.io PROTOCOL.md).
    *
    * Scale shape: the checkpoint is ONE distributed parquet scan
    * projecting only (path, size, partitionValues) — the file listing any
    * planner must hold driver-side anyway; data files are then ONE
    * parquet scan over all active files (not one scan per partition) —
    * partition-column values, which Delta stores in the
    * `add.partitionValues` of the LOG rather than in the data files, are
    * restored by a broadcast join from file name to partition tuple, so
    * a table with 10^5 partitions costs one broadcast of 10^5 tiny rows,
    * not 10^5 driver-side reads. Active file basenames must be distinct
    * (true for Spark/Delta UUID part names and for [[exportSnapshot]]'s
    * `segment-part` names); violated ⇒ loud error, never silent
    * misattribution.
    *
    * `verifySizes` (default true) checks every active file's on-disk
    * byte count against its `add.size` before any read — the same
    * corruption gate [[graft.functions.ShardExport.readShards]] applies
    * to shard manifests.
    */
  def importSnapshot(
      spark: SparkSession, deltaDir: String,
      verifySizes: Boolean = true): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.StructType
    import scala.jdk.CollectionConverters._

    val root = Paths.get(deltaDir)
    val logDir = root.resolve("_delta_log")
    require(Files.isDirectory(logDir), s"no _delta_log under $deltaDir")

    val st = new LogState

    // ---- checkpoint base state ----
    val lastCp = logDir.resolve("_last_checkpoint")
    val cpVersion: Long =
      if (!Files.exists(lastCp)) -1L
      else {
        val ptr = mapper.readTree(Files.readAllBytes(lastCp))
        val v = ptr.get("version").asLong()
        val parts = Option(ptr.get("parts")).filterNot(_.isNull).map(_.asInt())
        val cpFiles = parts match {
          case None    => Seq(logDir.resolve(f"$v%020d.checkpoint.parquet"))
          case Some(k) => (1 to k).map(i =>
            logDir.resolve(f"$v%020d.checkpoint.$i%010d.$k%010d.parquet"))
        }
        cpFiles.foreach(p => require(Files.exists(p),
          s"_last_checkpoint points at version $v but $p is missing"))
        val cp = spark.read.parquet(cpFiles.map(_.toString): _*)
        val cols = cp.schema.fieldNames.toSet
        require(cols.contains("add") && cols.contains("metaData"),
          s"checkpoint at version $v lacks add/metaData columns: ${cols.mkString(",")}")
        val md = cp.filter(col("metaData").isNotNull)
          .select(col("metaData.schemaString"), col("metaData.partitionColumns"),
            col("metaData.format.provider"))
          .collect()
        require(md.length == 1,
          s"checkpoint at version $v carries ${md.length} metaData rows, want exactly 1")
        st.schemaJson = md(0).getString(0)
        st.partCols = Option(md(0).getSeq[String](1)).getOrElse(Nil)
        require(md(0).getString(2) == "parquet",
          s"unsupported format provider: ${md(0).getString(2)}")
        cp.filter(col("add").isNotNull)
          .select(col("add.path"), col("add.size"), col("add.partitionValues"))
          .collect()
          .foreach { r =>
            val pv = Option(r.getMap[String, String](2))
              .map(_.toMap.map { case (k, x) => k -> Option(x) })
              .getOrElse(Map.empty[String, Option[String]])
            st.active.put(r.getString(0), (r.getLong(1), pv))
          }
        v
      }

    // ---- commit-JSON tail replay ----
    val commits = {
      val s = Files.list(logDir)
      try s.iterator().asScala
        .filter(_.getFileName.toString.matches("\\d{20}\\.json"))
        .toSeq.sortBy(_.getFileName.toString)
        .filter(_.getFileName.toString.dropRight(5).toLong > cpVersion)
      finally s.close()
    }
    require(cpVersion >= 0 || commits.nonEmpty, s"empty _delta_log under $deltaDir")
    val tailVersions = commits.map(_.getFileName.toString.dropRight(5).toLong)
    if (tailVersions.nonEmpty) {
      require(cpVersion < 0 || tailVersions.head == cpVersion + 1,
        s"commit gap after checkpoint $cpVersion: tail starts at ${tailVersions.head}")
      require(tailVersions == (tailVersions.head to tailVersions.last),
        s"gap in commit log versions: ${tailVersions.mkString(",")}")
    }
    replayCommits(commits, st)
    require(st.schemaJson != null, s"log at $deltaDir carries no metaData action")
    val schemaJson = st.schemaJson
    val partCols = st.partCols
    val active = st.active
    val schema = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
      .asInstanceOf[StructType]
    val dataSchema = StructType(schema.filterNot(f => partCols.contains(f.name)))

    val files = active.toSeq.sortBy(_._1).map { case (rel, (size, pv)) =>
      val p = root.resolve(rel)
      require(Files.exists(p), s"active file missing on disk: $p")
      if (verifySizes) {
        val got = Files.size(p)
        require(got == size,
          s"size mismatch for $rel: log says $size bytes, disk has $got")
      }
      (p, pv)
    }
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

    val paths = files.map(_._1.toString)
    val base = spark.read.schema(dataSchema).parquet(paths: _*)
    if (partCols.isEmpty) base.select(schema.fieldNames.map(col).toIndexedSeq: _*)
    else {
      val names = files.map(_._1.getFileName.toString)
      require(names.distinct.size == names.size,
        "active data files have colliding basenames — cannot attribute partitionValues")
      val mapRows = files.map { case (p, pv) =>
        org.apache.spark.sql.Row.fromSeq(
          p.getFileName.toString +: partCols.map(c => pv.get(c).flatten.orNull))
      }
      val mapSchema = StructType(
        org.apache.spark.sql.types.StructField("__graft_file",
          org.apache.spark.sql.types.StringType, nullable = false) +:
        partCols.map(c => org.apache.spark.sql.types.StructField(
          "__graft_pv_" + c, org.apache.spark.sql.types.StringType)))
      val pvDf = spark.createDataFrame(mapRows.asJava, mapSchema)
      val withFile = base.withColumn("__graft_file",
        element_at(split(input_file_name(), "/"), -1))
      val joined = withFile.join(broadcast(pvDf), Seq("__graft_file"), "left")
      val restored = partCols.foldLeft(joined) { (df, c) =>
        val t = schema(c).dataType
        df.withColumn(c, col("__graft_pv_" + c).cast(t))
      }
      restored.select(schema.fieldNames.map(col).toIndexedSeq: _*)
    }
  }

  /** Mutable log-replay state: metaData last-wins, add activates, remove
    * retires (last action per path wins) — shared by [[importSnapshot]]'s
    * tail replay and [[writeCheckpoint]]'s compaction so the two can never
    * disagree on log semantics.
    */
  private final class LogState {
    var schemaJson: String = _
    var partCols: Seq[String] = Nil
    var minReader: Int = 1
    var minWriter: Int = 2
    // path -> (size, partitionValues); insertion order irrelevant (reads sort)
    val active = scala.collection.mutable.LinkedHashMap
      .empty[String, (Long, Map[String, Option[String]])]
  }

  private def replayCommits(commits: Seq[Path], st: LogState): Unit = {
    import scala.jdk.CollectionConverters._
    for (commit <- commits; line <- Files.readAllLines(commit).asScala if line.nonEmpty) {
      val node = mapper.readTree(line)
      Option(node.get("protocol")).foreach { p =>
        st.minReader = p.get("minReaderVersion").asInt()
        st.minWriter = p.get("minWriterVersion").asInt()
      }
      Option(node.get("metaData")).foreach { md =>
        st.schemaJson = md.get("schemaString").asText()
        st.partCols = Option(md.get("partitionColumns")).toSeq
          .flatMap(_.elements().asScala).map(_.asText())
        val provider = md.get("format").get("provider").asText()
        require(provider == "parquet", s"unsupported format provider: $provider")
      }
      Option(node.get("add")).foreach { add =>
        val pv = Option(add.get("partitionValues")).map { o =>
          o.properties().asScala.map { e =>
            e.getKey -> (if (e.getValue.isNull) None else Some(e.getValue.asText()))
          }.toMap
        }.getOrElse(Map.empty[String, Option[String]])
        st.active.put(add.get("path").asText(), (add.get("size").asLong(), pv))
      }
      Option(node.get("remove")).foreach(rm => st.active.remove(rm.get("path").asText()))
    }
  }

  private def listCommits(logDir: Path): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    val s = Files.list(logDir)
    try s.iterator().asScala
      .filter(_.getFileName.toString.matches("\\d{20}\\.json"))
      .toSeq.sortBy(_.getFileName.toString)
    finally s.close()
  }

  /** Append commit `version` to an existing (or fresh) `_delta_log`:
    * `removes` retire previously-added relative paths, `adds` activate
    * relative paths whose files must already sit under `deltaDir` (sizes
    * are read from disk — the log never carries a size the bytes don't
    * back). `schemaJson` must be given on the FIRST commit (it emits the
    * protocol + metaData actions) and may be given later to record a
    * schema change. Versions must be appended contiguously — the same
    * no-gap rule [[importSnapshot]] enforces on read.
    */
  def writeCommit(
      deltaDir: String, version: Long, adds: Seq[String],
      removes: Seq[String] = Nil, schemaJson: Option[String] = None): Unit = {
    val root = Paths.get(deltaDir)
    val logDir = root.resolve("_delta_log")
    Files.createDirectories(logDir)
    val existing = listCommits(logDir)
      .map(_.getFileName.toString.dropRight(5).toLong)
    val expected = if (existing.isEmpty) 0L else existing.last + 1
    require(version == expected,
      s"non-contiguous commit: want version $expected, got $version")
    require(version > 0 || schemaJson.isDefined,
      "the first commit must carry schemaJson (protocol + metaData)")
    val now = System.currentTimeMillis()
    val actions = Seq.newBuilder[com.fasterxml.jackson.databind.node.ObjectNode]
    schemaJson.foreach { sj =>
      if (version == 0L) {
        val n = mapper.createObjectNode()
        val p = n.putObject("protocol")
        p.put("minReaderVersion", 1); p.put("minWriterVersion", 2)
        actions += n
      }
      val n = mapper.createObjectNode()
      val md = n.putObject("metaData")
      md.put("id", java.util.UUID.randomUUID().toString)
      val fmt = md.putObject("format")
      fmt.put("provider", "parquet"); fmt.putObject("options")
      md.put("schemaString", sj)
      md.putArray("partitionColumns")
      md.putObject("configuration")
      md.put("createdTime", now)
      actions += n
    }
    removes.foreach { rel =>
      val n = mapper.createObjectNode()
      val rm = n.putObject("remove")
      rm.put("path", rel)
      rm.put("deletionTimestamp", now)
      rm.put("dataChange", true)
      actions += n
    }
    adds.foreach { rel =>
      val f = root.resolve(rel)
      require(Files.exists(f), s"add action for a file not on disk: $f")
      val n = mapper.createObjectNode()
      val add = n.putObject("add")
      add.put("path", rel)
      add.putObject("partitionValues")
      add.put("size", Files.size(f))
      add.put("modificationTime", now)
      add.put("dataChange", true)
      actions += n
    }
    val log = actions.result().map(mapper.writeValueAsString)
      .mkString("", "\n", "\n")
    Files.write(logDir.resolve(f"$version%020d.json"), log.getBytes("UTF-8"))
    ()
  }

  /** Compact the commit-JSON log at `deltaDir` up to and including
    * `version` into a parquet checkpoint (delta.io PROTOCOL.md checkpoint
    * schema: one row per action, `protocol`/`metaData`/`add` structs) and
    * flip `_last_checkpoint` to it — after which readers load the base
    * state from one parquet scan and replay only the tail, the shape that
    * keeps a long-lived table's open cost O(tail) instead of O(history).
    * `parts` > 1 splits the add rows round-robin into the multi-part
    * file-name form (`v.checkpoint.i.parts.parquet`) — real tables use it
    * above ~10^6 actions; supported here so the reader's multi-part path
    * is exercised by the same writer.
    *
    * The checkpoint is written as actual FILES under `_delta_log/` (one
    * rename per part — atomic on a real object store's metadata layer)
    * and `_last_checkpoint` flips LAST, so a crash mid-write leaves the
    * previous pointer valid — readers never see a half-checkpoint.
    */
  def writeCheckpoint(
      spark: SparkSession, deltaDir: String, version: Long,
      parts: Int = 1): Unit = {
    import org.apache.spark.sql.{Row => SRow}
    import org.apache.spark.sql.types._
    require(parts >= 1, s"parts must be >= 1, got $parts")
    val root = Paths.get(deltaDir)
    val logDir = root.resolve("_delta_log")
    val commits = listCommits(logDir)
      .filter(_.getFileName.toString.dropRight(5).toLong <= version)
    val versions = commits.map(_.getFileName.toString.dropRight(5).toLong)
    require(versions.nonEmpty && versions.head == 0L &&
      versions == (0L to versions.last) && versions.last == version,
      s"cannot checkpoint version $version: commits on disk are ${versions.mkString(",")}")
    val st = new LogState
    replayCommits(commits, st)
    require(st.schemaJson != null, s"log at $deltaDir carries no metaData action")

    val pvType = MapType(StringType, StringType)
    val cpSchema = StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType)))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("format", StructType(Seq(StructField("provider", StringType)))),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("createdTime", LongType)))),
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", pvType),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("dataChange", BooleanType))))))
    val now = System.currentTimeMillis()
    val protoRow = SRow(SRow(st.minReader, st.minWriter), null, null)
    val mdRow = SRow(null, SRow(java.util.UUID.randomUUID().toString,
      SRow("parquet"), st.schemaJson, st.partCols, now), null)
    val addRows = st.active.toSeq.map { case (path, (size, pv)) =>
      SRow(null, null, SRow(path, pv.map { case (k, v) => k -> v.orNull }, size, now, true))
    }
    // metaData/protocol ride in part 1; adds split round-robin across parts
    val partRows: Seq[Seq[SRow]] =
      if (parts == 1) Seq(Seq(protoRow, mdRow) ++ addRows)
      else (0 until parts).map { i =>
        val mine = addRows.zipWithIndex.collect { case (r, j) if j % parts == i => r }
        if (i == 0) Seq(protoRow, mdRow) ++ mine else mine
      }
    val names =
      if (parts == 1) Seq(f"$version%020d.checkpoint.parquet")
      else (1 to parts).map(i => f"$version%020d.checkpoint.$i%010d.$parts%010d.parquet")
    partRows.zip(names).foreach { case (rows, name) =>
      // a checkpoint part is a single parquet FILE: write a 1-part dir,
      // then move the part file onto the spec-mandated name
      import scala.jdk.CollectionConverters._
      val tmp = Files.createTempDirectory("graft_delta_cp_")
      spark.createDataFrame(rows.asJava, cpSchema).coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = listParquet(tmp) match {
        case Seq(one) => one
        case other => throw new IllegalStateException(
          s"expected exactly one checkpoint part file, got ${other.size}")
      }
      Files.move(part, logDir.resolve(name), StandardCopyOption.REPLACE_EXISTING)
      ()
    }
    val ptr = mapper.createObjectNode()
    ptr.put("version", version)
    ptr.put("size", partRows.map(_.size).sum)
    if (parts > 1) ptr.put("parts", parts)
    // pointer flips LAST via atomic rename — a crash mid-write must leave
    // the PREVIOUS pointer intact (the appendSnapshot/publishIncremental
    // pointer rule; an in-place truncate+write would strand a corrupt
    // pointer that fails hard on JSON parse)
    val tmpPtr = logDir.resolve("_last_checkpoint.tmp")
    Files.write(tmpPtr, (mapper.writeValueAsString(ptr) + "\n").getBytes("UTF-8"))
    Files.move(tmpPtr, logDir.resolve("_last_checkpoint"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    ()
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
