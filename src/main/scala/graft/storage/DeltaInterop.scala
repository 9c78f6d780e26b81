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

  /** VACUUM — the Delta maintenance op next to Iceberg's
    * [[IcebergInterop.expireSnapshots]]/`removeOrphanFiles`: physically
    * delete parquet files under the table root that the CURRENT snapshot
    * does not reference, subject to the retention window (delta.io
    * VACUUM semantics — default 7 days, and the guard exists for the same
    * reason there: a concurrent reader of an older snapshot or an
    * in-flight uncommitted write may still need recent unreferenced
    * files).
    *
    * Candidate gates, each REQUIRED before a byte is deleted:
    *  - not in the live set of the resolved current state;
    *  - not under `_delta_log/` or `metadata/` (co-resident Iceberg
    *    metadata from [[convertFromIceberg]] stays untouched);
    *  - older than `retentionMs`: a tombstoned file by its remove
    *    action's `deletionTimestamp` (the log is authoritative), an
    *    orphan (never logged — an aborted writer's debris) by file mtime.
    *
    * After a vacuum, time travel to a version that referenced a deleted
    * file fails on read — exactly Delta's documented trade. Returns the
    * table-relative paths deleted (or that WOULD be deleted with
    * `dryRun = true`, which never touches disk).
    *
    * `retentionMs` below the 7-day default is refused unless
    * `disableRetentionCheck = true` — delta.io's
    * `retentionDurationCheck.enabled` guard, and for the same reason: a
    * zero window deletes an in-flight uncommitted writer's files (the
    * orphan-by-mtime arm) and breaks every concurrent older-snapshot
    * reader. Log paths are URL-decoded before resolution (PROTOCOL.md
    * mandates add/remove paths be percent-encoded), so an
    * externally-written table whose live file name contains e.g. a space
    * keeps that file in the live set instead of losing it to the orphan
    * arm.
    */
  def vacuum(spark: SparkSession, deltaDir: String,
      retentionMs: Long = 7L * 24 * 3600 * 1000,
      dryRun: Boolean = false,
      disableRetentionCheck: Boolean = false): Seq[String] = {
    import scala.jdk.CollectionConverters._
    require(retentionMs >= 0, s"negative retention $retentionMs")
    require(disableRetentionCheck || retentionMs >= 7L * 24 * 3600 * 1000,
      s"retention ${retentionMs}ms is below the 7-day default; a short " +
        "window deletes files a concurrent older-snapshot reader or an " +
        "in-flight writer still needs — pass disableRetentionCheck=true " +
        "to override deliberately")
    val root = Paths.get(deltaDir).normalize()
    val logDir = root.resolve("_delta_log")
    require(Files.isDirectory(logDir), s"no _delta_log under $deltaDir")
    val st = resolveState(spark, root, logDir, deltaDir)
    val live: Set[Path] =
      st.active.keysIterator.map(rel => root.resolve(decodeLogPath(rel)).normalize()).toSet
    // deletionTimestamp per removed path, LATEST wins (a path re-added and
    // re-removed carries its most recent tombstone)
    val tombstones = scala.collection.mutable.Map.empty[Path, Long]
    for (commit <- listCommits(logDir);
         line <- Files.readAllLines(commit).asScala if line.nonEmpty) {
      val node = mapper.readTree(line)
      Option(node.get("remove")).foreach { rm =>
        val p = root.resolve(decodeLogPath(rm.get("path").asText())).normalize()
        val ts = Option(rm.get("deletionTimestamp"))
          .filterNot(_.isNull).map(_.asLong()).getOrElse(0L)
        tombstones(p) = math.max(tombstones.getOrElse(p, 0L), ts)
      }
    }
    val cutoff = System.currentTimeMillis() - retentionMs
    val candidates = {
      import scala.jdk.CollectionConverters._
      val s = Files.walk(root)
      try s.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        Files.isRegularFile(p) && n.endsWith(".parquet") &&
          !n.startsWith(".") && !n.startsWith("_") &&
          !p.normalize().startsWith(logDir) &&
          !p.normalize().startsWith(root.resolve("metadata"))
      }.map(_.normalize()).toSeq
      finally s.close()
    }
    val doomed = candidates.filterNot(live.contains).filter { p =>
      tombstones.get(p) match {
        case Some(ts) => ts <= cutoff // the log's word on when it died
        case None => // never logged: an aborted writer's debris, by mtime
          Files.getLastModifiedTime(p).toMillis <= cutoff
      }
    }.sortBy(_.toString)
    if (!dryRun) doomed.foreach(p => Files.deleteIfExists(p))
    doomed.map(p => root.relativize(p).toString)
  }

  /** PROTOCOL.md mandates add/remove paths be percent-encoded relative
    * URIs; decode before resolving against the filesystem — an encoded
    * live path (`a%20b.parquet`) that stays raw misses the on-disk file
    * and, in [[vacuum]], would be DELETED as an orphan. Off-spec raw
    * paths (illegal chars, opaque scheme-looking names) fall back
    * verbatim: for a %-free name decode is the identity either way. */
  private def decodeLogPath(rel: String): String =
    try {
      val p = new java.net.URI(rel).getPath
      if (p == null || p.isEmpty) rel else p
    } catch { case _: java.net.URISyntaxException => rel }

  /** Metadata-only Iceberg → Delta conversion — [[IcebergInterop
    * .convertFromDelta]]'s reverse leg: write a v0 `_delta_log` INSIDE the
    * Iceberg table directory whose `add` actions name the live data files
    * by table-relative path. Zero data bytes move; the table then reads
    * through both bridges, and the Iceberg metadata stays authoritative
    * for Iceberg readers. IDENTITY-partitioned tables convert (round 16):
    * the manifest partition structs map 1:1 onto `add.partitionValues`
    * and the spec's source columns become the metaData's
    * `partitionColumns` — both the engine-written shape (files carry the
    * column; the Delta read projects it away and serves the log values)
    * and the Hive-migrated `add_files` shape (files lack it entirely)
    * read identically through [[importSnapshot]]. Refusals ride in
    * [[IcebergInterop.liveSnapshot]] (non-identity transforms, partition
    * types beyond string/int/long, delete files) plus: data files OUTSIDE
    * the table root (legal in Iceberg, unreachable by a relative Delta
    * add) and an existing `_delta_log`.
    */
  def convertFromIceberg(spark: SparkSession, icebergDir: String): Seq[String] = {
    val root = Paths.get(icebergDir).normalize()
    require(!Files.exists(root.resolve("_delta_log")),
      s"$icebergDir already holds a _delta_log — refusing to overwrite")
    val snap = IcebergInterop.liveSnapshot(spark, icebergDir)
    val relPv = snap.files.map { case (abs, size, pv) =>
      val p = Paths.get(abs).normalize()
      require(p.startsWith(root),
        s"live data file outside the table root: $abs — a relative Delta " +
          "add cannot name it, refusing")
      val got = Files.size(p)
      require(got == size,
        s"size mismatch for $abs: manifest says $size bytes, disk has $got")
      (root.relativize(p).toString, pv)
    }
    writeCommit(icebergDir, 0L, adds = relPv.map(_._1),
      schemaJson = Some(snap.schemaJson),
      partitionColumns = snap.partitionColumns,
      partitionValues = relPv.filter(_._2.nonEmpty).toMap)
    relPv.map(_._1)
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

    val st = resolveState(spark, root, logDir, deltaDir)
    val schemaJson = st.schemaJson
    val partCols = st.partCols
    val active = st.active
    val schema = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
      .asInstanceOf[StructType]
    // column mapping: the parquet files carry PHYSICAL names (per-field
    // schemaString metadata); read physically, serve logically. A RENAME
    // only rewrites the logical name in the metaData — the physical
    // name/id is immutable — so pre-rename files read correctly with
    // zero rewrite (the whole point of the mode). ID mode (round 16)
    // rides the same path with field ids attached to the read schema and
    // Spark's native field-id resolution switched on — set BEFORE the
    // lazy DataFrame is built so the scan executes under it; the flag
    // only affects requested fields that CARRY parquet.field.id
    // metadata, so every other read in the session is untouched.
    val mapped = st.cmMode.isDefined
    if (st.cmMode.contains("id"))
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val dataSchema = physicalType(
      StructType(schema.filterNot(f => partCols.contains(f.name))), st.cmMode)
      .asInstanceOf[StructType]

    val files = active.toSeq.sortBy(_._1).map { case (rel, af) =>
      val p = root.resolve(rel)
      require(Files.exists(p), s"active file missing on disk: $p")
      if (verifySizes) {
        val got = Files.size(p)
        require(got == af.size,
          s"size mismatch for $rel: log says ${af.size} bytes, disk has $got")
      }
      (p, af)
    }
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

    val paths = files.map(_._1.toString)
    val base = spark.read.schema(dataSchema).parquet(paths: _*)
    val withParts =
      if (partCols.isEmpty) base
      else {
        val names = files.map(_._1.getFileName.toString)
        require(names.distinct.size == names.size,
          "active data files have colliding basenames — cannot attribute partitionValues")
        val mapRows = files.map { case (p, af) =>
          // under name-mode mapping the log's partitionValues are keyed by
          // PHYSICAL name (PROTOCOL.md Column Mapping); logical tolerated
          org.apache.spark.sql.Row.fromSeq(
            p.getFileName.toString +: partCols.map { c =>
              af.pv.get(physicalName(schema(c), mapped))
                .orElse(af.pv.get(c)).flatten.orNull
            })
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
        partCols.foldLeft(joined) { (df, c) =>
          val t = schema(c).dataType
          df.withColumn(c, col("__graft_pv_" + c).cast(t))
        }
      }
    val masked = applyDeletionVectors(spark, root, withParts, files)
    // physical -> logical restore: pure projection (renames + by-position
    // struct casts for nested fields) — no data movement, pruning intact
    masked.select(schema.fields.map { f =>
      if (partCols.contains(f.name) || !mapped) col(f.name)
      else col(physicalName(f, mapped)).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
  }

  /** The resolved LIVE state of a Delta table, for cross-format consumers
    * ([[IcebergInterop.convertFromDelta]] — the UniForm-style conversion):
    * last-wins schema JSON, partition columns, the column-mapping mode,
    * and the active files as (absolutePath, logSize, carriesDv,
    * partitionValues). Shares [[resolveState]] with the readers, so a
    * converter can never disagree with [[importSnapshot]] about what is
    * live.
    */
  final case class LiveState(
      schemaJson: String, partitionColumns: Seq[String],
      columnMappingMode: Option[String],
      files: Seq[(String, Long, Boolean, Map[String, Option[String]])])

  def liveState(spark: SparkSession, deltaDir: String): LiveState = {
    val root = Paths.get(deltaDir)
    val logDir = root.resolve("_delta_log")
    require(Files.isDirectory(logDir), s"no _delta_log under $deltaDir")
    val st = resolveState(spark, root, logDir, deltaDir)
    LiveState(st.schemaJson, st.partCols, st.cmMode,
      st.active.toSeq.sortBy(_._1).map { case (rel, af) =>
        (root.resolve(rel).toString, af.size, af.dv.isDefined, af.pv)
      })
  }

  /** Resolve the table state at `deltaDir`: checkpoint base (when
    * `_last_checkpoint` points at one) + commit-JSON tail replay, then the
    * reader-protocol gate. Shared by [[importSnapshot]] and [[deleteWhere]]
    * so the two can never disagree on what is live.
    */
  private def resolveState(
      spark: SparkSession, root: Path, logDir: Path, deltaDir: String): LogState = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.StructType
    import scala.jdk.CollectionConverters._

    val st = new LogState
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
        val mdFields = cp.schema("metaData").dataType
          .asInstanceOf[StructType].fieldNames.toSet
        val confCol =
          if (mdFields.contains("configuration")) col("metaData.configuration")
          else lit(null).cast("map<string,string>")
        val md = cp.filter(col("metaData").isNotNull)
          .select(col("metaData.schemaString"), col("metaData.partitionColumns"),
            col("metaData.format.provider"), confCol)
          .collect()
        require(md.length == 1,
          s"checkpoint at version $v carries ${md.length} metaData rows, want exactly 1")
        st.schemaJson = md(0).getString(0)
        st.partCols = Option(md(0).getSeq[String](1)).getOrElse(Nil)
        require(md(0).getString(2) == "parquet",
          s"unsupported format provider: ${md(0).getString(2)}")
        // same column-mapping rule as the JSON replay path: name AND id
        // modes supported (id resolves through Spark's native
        // parquet.field.id matching — see physicalType)
        st.configuration = Option(md(0).getMap[String, String](3))
          .map(_.toMap.filter(_._2 != null)).getOrElse(Map.empty)
        st.cmMode = st.configuration.get("delta.columnMapping.mode")
          .filterNot(_ == "none")
        gateCmMode(st.cmMode)
        if (cols.contains("protocol")) {
          val protoSchema = cp.schema("protocol").dataType
            .asInstanceOf[StructType].fieldNames.toSet
          val pr = cp.filter(col("protocol").isNotNull)
            .select(col("protocol.minReaderVersion"), col("protocol.minWriterVersion"),
              if (protoSchema.contains("readerFeatures")) col("protocol.readerFeatures")
              else lit(null).cast("array<string>"))
            .collect()
          pr.headOption.foreach { r =>
            st.minReader = r.getInt(0); st.minWriter = r.getInt(1)
            st.readerFeatures =
              Option(r.getSeq[String](2)).map(_.toSet).getOrElse(Set.empty)
          }
        }
        // add.deletionVector is part of the checkpoint add schema whenever
        // the table carries DVs (PROTOCOL.md checkpoint schema) — a reader
        // dropping the column would resurrect checkpointed deletes
        val addFields = cp.schema("add").dataType
          .asInstanceOf[StructType].fieldNames.toSet
        val dvCol =
          if (addFields.contains("deletionVector")) col("add.deletionVector")
          else lit(null).cast(
            "struct<storageType:string,pathOrInlineDv:string,offset:int," +
              "sizeInBytes:int,cardinality:bigint>")
        cp.filter(col("add").isNotNull)
          .select(col("add.path"), col("add.size"), col("add.partitionValues"), dvCol)
          .collect()
          .foreach { r =>
            val pv = Option(r.getMap[String, String](2))
              .map(_.toMap.map { case (k, x) => k -> Option(x) })
              .getOrElse(Map.empty[String, Option[String]])
            val dv = Option(r.getStruct(3)).map { d =>
              DeletionVectors.DvDescriptor(
                d.getString(0), d.getString(1),
                if (d.isNullAt(2)) None else Some(d.getInt(2)),
                d.getInt(3), d.getLong(4))
            }
            st.active.put(r.getString(0), ActiveFile(r.getLong(1), pv, dv))
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
    gateProtocol(st, deltaDir)
    st
  }

  /** Mask DV'd rows out of the assembled scan: each live file's deletion
    * vector is parsed ON EXECUTORS (one task per descriptor, memory
    * bounded by that DV's compressed size) into `(file, row_index)` pairs,
    * which LEFT-ANTI join the data on
    * (normalized `_metadata.file_path`, `_metadata.row_index`) — the
    * identical shape the Iceberg bridge uses for v2 position deletes
    * (q146). The total deleted-row count is known driver-side from the
    * descriptors' `cardinality` WITHOUT reading any bitmap, so the build
    * side is broadcast exactly when it is provably small and shuffled
    * otherwise — the decision a 100 TB import must get right.
    */
  private def applyDeletionVectors(
      spark: SparkSession, root: Path,
      df: org.apache.spark.sql.DataFrame,
      files: Seq[(Path, ActiveFile)]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val dvd = files.collect { case (p, af) if af.dv.isDefined => (p.toString, af.dv.get) }
    if (dvd.isEmpty) return df
    val totalDeleted = dvd.map(_._2.cardinality).sum
    import spark.implicits._
    val descDs = spark.createDataset(dvd.map { case (abs, d) =>
      (abs, d.storageType, d.pathOrInlineDv, d.offset.getOrElse(-1), d.sizeInBytes,
        d.cardinality)
    })
    val rootStr = root.toString
    val deleted = descDs.flatMap { case (abs, st0, pOrI, off, size, card) =>
      val desc = DeletionVectors.DvDescriptor(
        st0, pOrI, if (off < 0) None else Some(off), size, card)
      DeletionVectors.deletedRows(java.nio.file.Paths.get(rootStr), desc)
        .map(idx => (abs, idx))
    }.toDF("__graft_dv_path", "__graft_dv_pos")
    val build =
      if (totalDeleted <= (1L << 20)) broadcast(deleted) else deleted
    df.withColumn("__graft_dv_path",
        regexp_replace(col("_metadata.file_path"), "^file:/+", "/"))
      .withColumn("__graft_dv_pos", col("_metadata.row_index"))
      .join(build, Seq("__graft_dv_path", "__graft_dv_pos"), "left_anti")
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
    var readerFeatures: Set[String] = Set.empty
    // delta.columnMapping.mode from the latest metaData ("name" supported:
    // physical parquet names come from per-field schema metadata; "id"
    // refuses — parquet field-id resolution is out of bridge scope)
    var cmMode: Option[String] = None
    // the latest metaData's full configuration — retained so checkpoints
    // re-emit it (a checkpoint that dropped delta.columnMapping.mode would
    // silently serve NULLs for every mapped column on the next import)
    var configuration: Map[String, String] = Map.empty
    // path -> active-file state; insertion order irrelevant (reads sort)
    val active = scala.collection.mutable.LinkedHashMap.empty[String, ActiveFile]
  }

  /** One live file per the replayed log: its declared size, partition
    * values, and (reader protocol v3 `deletionVectors` feature) the
    * deletion vector masking its dead rows.
    */
  private final case class ActiveFile(
      size: Long,
      pv: Map[String, Option[String]],
      dv: Option[DeletionVectors.DvDescriptor])

  /** Reader features this bridge implements. `minReaderVersion` 3 tables
    * whose `readerFeatures` exceed this set REFUSE on import — reading a
    * table through an unimplemented reader feature (v2 checkpoints, type
    * widening, ...) produces silently wrong rows, the failure class the
    * Iceberg bridge refuses the same way. `columnMapping` is honored in
    * NAME mode only; the metaData parse refuses id mode before the gate.
    */
  private val SupportedReaderFeatures = Set("deletionVectors", "columnMapping")

  /** Declared column-mapping modes this bridge reads: name + id. A mode
    * string outside the protocol's vocabulary refuses at parse time —
    * mis-mapping columns is the silent-NULL failure class.
    */
  private def gateCmMode(mode: Option[String]): Unit =
    mode.foreach(m => require(m == "name" || m == "id",
      s"unknown delta.columnMapping.mode '$m' — this bridge reads " +
        "name and id modes"))

  private def gateProtocol(st: LogState, where: String): Unit = {
    if (st.minReader == 2) {
      // reader v2 = column mapping (PROTOCOL.md): honored iff the table
      // declares a mode we implement (name or id)
      require(st.cmMode.contains("name") || st.cmMode.contains("id"),
        s"minReaderVersion 2 at $where without a supported " +
          "delta.columnMapping.mode (name|id) — refusing rather than " +
          "mis-mapping columns")
    } else if (st.minReader >= 3) {
      require(st.minReader == 3,
        s"minReaderVersion ${st.minReader} at $where is beyond this bridge")
      val unsupported = st.readerFeatures -- SupportedReaderFeatures
      require(unsupported.isEmpty,
        s"unsupported readerFeatures ${unsupported.mkString(",")} at $where — " +
          s"this bridge implements ${SupportedReaderFeatures.mkString(",")} only")
    }
  }

  /** The physical (on-disk parquet) column name of a schema field under
    * name-mode column mapping — declared per field in the schemaString's
    * metadata (PROTOCOL.md "Column Mapping"); a mapped table whose field
    * lacks the declaration refuses (guessing the logical name would
    * silently serve NULLs for genuinely-renamed columns).
    */
  private def physicalName(
      f: org.apache.spark.sql.types.StructField, mapped: Boolean): String =
    if (!mapped) f.name
    else {
      require(f.metadata.contains("delta.columnMapping.physicalName"),
        s"column-mapped table: field '${f.name}' carries no " +
          "delta.columnMapping.physicalName metadata — refusing to guess")
      f.metadata.getString("delta.columnMapping.physicalName")
    }

  /** Recursively rewrite a logical Spark type to its PHYSICAL shape under
    * column mapping: struct fields (at any depth) take their declared
    * physical names; arrays/maps recurse; scalars pass through. Types are
    * never changed — only names — so the physical->logical restore is a
    * by-position struct cast.
    *
    * Under ID mode (`mode = Some("id")`) each field ADDITIONALLY carries
    * its `delta.columnMapping.id` as `parquet.field.id` metadata — the
    * key Spark's parquet reader resolves by when
    * `spark.sql.parquet.fieldId.read.enabled` is on. That delegates the
    * whole id-resolution contract (PROTOCOL.md "Column Mapping": id-mode
    * columns resolve by parquet field id, never by name) to the native
    * vectorized scan: a file whose physical NAME drifted from the
    * metadata (an Iceberg-compat/UniForm import) still reads correctly
    * because the immutable field id matches, and a field id absent from
    * an older file null-fills exactly like schema evolution.
    */
  private def physicalType(
      dt: org.apache.spark.sql.types.DataType,
      mode: Option[String]): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    val mapped = mode.isDefined
    dt match {
      case st0: StructType => StructType(st0.fields.map { f =>
        val base = StructField(physicalName(f, mapped),
          physicalType(f.dataType, mode), f.nullable)
        if (mode.contains("id")) {
          require(f.metadata.contains("delta.columnMapping.id"),
            s"id-mapped table: field '${f.name}' carries no " +
              "delta.columnMapping.id metadata — refusing to guess")
          base.copy(metadata = new MetadataBuilder()
            .putLong("parquet.field.id",
              f.metadata.getLong("delta.columnMapping.id")).build())
        } else base
      })
      case ArrayType(el, n) => ArrayType(physicalType(el, mode), n)
      case MapType(k, v, n) =>
        MapType(physicalType(k, mode), physicalType(v, mode), n)
      case other => other
    }
  }

  private def parseDvNode(
      dvNode: com.fasterxml.jackson.databind.JsonNode): DeletionVectors.DvDescriptor =
    DeletionVectors.DvDescriptor(
      storageType = dvNode.get("storageType").asText(),
      pathOrInlineDv = dvNode.get("pathOrInlineDv").asText(),
      offset = Option(dvNode.get("offset")).filterNot(_.isNull).map(_.asInt()),
      sizeInBytes = dvNode.get("sizeInBytes").asInt(),
      cardinality = dvNode.get("cardinality").asLong())

  private def replayCommits(commits: Seq[Path], st: LogState): Unit = {
    import scala.jdk.CollectionConverters._
    for (commit <- commits; line <- Files.readAllLines(commit).asScala if line.nonEmpty) {
      val node = mapper.readTree(line)
      Option(node.get("protocol")).foreach { p =>
        st.minReader = p.get("minReaderVersion").asInt()
        st.minWriter = p.get("minWriterVersion").asInt()
        st.readerFeatures = Option(p.get("readerFeatures")).toSet[
          com.fasterxml.jackson.databind.JsonNode]
          .flatMap(_.elements().asScala.map(_.asText()))
      }
      Option(node.get("metaData")).foreach { md =>
        st.schemaJson = md.get("schemaString").asText()
        st.partCols = Option(md.get("partitionColumns")).toSeq
          .flatMap(_.elements().asScala).map(_.asText())
        val provider = md.get("format").get("provider").asText()
        require(provider == "parquet", s"unsupported format provider: $provider")
        // column mapping renames the PHYSICAL parquet columns away from the
        // logical schema names. NAME mode: every field's physical name is
        // declared in the schemaString's per-field metadata — PROTOCOL.md
        // "Column Mapping" — so the read maps physical -> logical
        // deterministically and renames cost nothing. ID mode (round 16):
        // columns resolve by parquet field id, which the read honors by
        // attaching each field's delta.columnMapping.id as
        // parquet.field.id on the scan schema (native Spark field-id
        // resolution). Unknown future modes refuse loudly.
        st.cmMode = None
        st.configuration = Map.empty
        Option(md.get("configuration")).filterNot(_.isNull).foreach { conf =>
          st.configuration = conf.properties().asScala.flatMap { e =>
            if (e.getValue.isNull) None else Some(e.getKey -> e.getValue.asText())
          }.toMap
          st.cmMode = st.configuration.get("delta.columnMapping.mode")
            .filterNot(_ == "none")
          gateCmMode(st.cmMode)
        }
      }
      Option(node.get("add")).foreach { add =>
        val pv = Option(add.get("partitionValues")).map { o =>
          o.properties().asScala.map { e =>
            e.getKey -> (if (e.getValue.isNull) None else Some(e.getValue.asText()))
          }.toMap
        }.getOrElse(Map.empty[String, Option[String]])
        val dv = Option(add.get("deletionVector")).filterNot(_.isNull).map(parseDvNode)
        st.active.put(add.get("path").asText(),
          ActiveFile(add.get("size").asLong(), pv, dv))
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
      removes: Seq[String] = Nil, schemaJson: Option[String] = None,
      dvs: Map[String, DeletionVectors.DvDescriptor] = Map.empty,
      configuration: Map[String, String] = Map.empty,
      protocolVersions: Option[(Int, Int)] = None,
      partitionColumns: Seq[String] = Nil,
      partitionValues: Map[String, Map[String, Option[String]]] = Map.empty): Unit = {
    val root = Paths.get(deltaDir)
    val logDir = root.resolve("_delta_log")
    Files.createDirectories(logDir)
    val existing = listCommits(logDir)
      .map(_.getFileName.toString.dropRight(5).toLong)
    // pre-checkpoint commits may have been cleaned up (Delta metadata
    // cleanup): the checkpoint pointer anchors contiguity when it is newer
    val cpV = {
      val lastCp = logDir.resolve("_last_checkpoint")
      if (Files.exists(lastCp))
        mapper.readTree(Files.readAllBytes(lastCp)).get("version").asLong()
      else -1L
    }
    val expected = (existing.lastOption.getOrElse(-1L) max cpV) + 1
    require(version == expected,
      s"non-contiguous commit: want version $expected, got $version")
    require(version > 0 || schemaJson.isDefined,
      "the first commit must carry schemaJson (protocol + metaData)")
    require((dvs.keySet -- adds.toSet).isEmpty,
      s"dv descriptors for paths not being added: ${(dvs.keySet -- adds.toSet).mkString(",")}")
    require(partitionColumns.isEmpty || schemaJson.isDefined,
      "partitionColumns ride the metaData action — pass schemaJson with them")
    require((partitionValues.keySet -- adds.toSet).isEmpty,
      "partitionValues for paths not being added: " +
        (partitionValues.keySet -- adds.toSet).mkString(","))
    val now = System.currentTimeMillis()
    val actions = Seq.newBuilder[com.fasterxml.jackson.databind.node.ObjectNode]
    // attaching a DV is a reader-visible capability: upgrade the protocol
    // in the SAME commit (PROTOCOL.md: deletionVectors is a reader+writer
    // feature under minReaderVersion 3 / minWriterVersion 7), so any
    // feature-honest reader either applies the DVs or refuses — never
    // silently serves deleted rows
    if (dvs.nonEmpty) {
      val n = mapper.createObjectNode()
      val p = n.putObject("protocol")
      p.put("minReaderVersion", 3); p.put("minWriterVersion", 7)
      p.putArray("readerFeatures").add("deletionVectors")
      p.putArray("writerFeatures").add("deletionVectors")
      actions += n
    }
    schemaJson.foreach { sj =>
      if (version == 0L && dvs.isEmpty) {
        val (minR, minW) = protocolVersions.getOrElse((1, 2))
        val n = mapper.createObjectNode()
        val p = n.putObject("protocol")
        p.put("minReaderVersion", minR); p.put("minWriterVersion", minW)
        actions += n
      }
      val n = mapper.createObjectNode()
      val md = n.putObject("metaData")
      md.put("id", java.util.UUID.randomUUID().toString)
      val fmt = md.putObject("format")
      fmt.put("provider", "parquet"); fmt.putObject("options")
      md.put("schemaString", sj)
      val pcArr = md.putArray("partitionColumns")
      partitionColumns.foreach(pcArr.add)
      val cfg = md.putObject("configuration")
      configuration.toSeq.sortBy(_._1).foreach { case (k, v) => cfg.put(k, v) }
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
      val pvObj = add.putObject("partitionValues")
      partitionValues.getOrElse(rel, Map.empty).toSeq.sortBy(_._1).foreach {
        case (c, Some(v)) => pvObj.put(c, v)
        case (c, None)    => pvObj.putNull(c)
      }
      add.put("size", Files.size(f))
      add.put("modificationTime", now)
      add.put("dataChange", true)
      dvs.get(rel).foreach { d =>
        val dn = add.putObject("deletionVector")
        dn.put("storageType", d.storageType)
        dn.put("pathOrInlineDv", d.pathOrInlineDv)
        d.offset.foreach(o => dn.put("offset", o))
        dn.put("sizeInBytes", d.sizeInBytes)
        dn.put("cardinality", d.cardinality)
      }
      actions += n
    }
    val log = actions.result().map(mapper.writeValueAsString)
      .mkString("", "\n", "\n")
    Files.write(logDir.resolve(f"$version%020d.json"), log.getBytes("UTF-8"))
    ()
  }

  /** Row-level DELETE expressed as deletion vectors — the modern Delta
    * DELETE shape (no data-file rewrite): rows matching `predicate` are
    * marked dead in per-file RoaringBitmaps, every touched file's NEW
    * vector is the union of its old one and this wave's matches
    * (PROTOCOL.md: a file's DV replaces its predecessor, so it must
    * contain it), and one commit retires + re-adds the touched files
    * with their new descriptors. All vectors of the wave share ONE
    * `deletion_vector_<uuid>.bin` (the real writer layout, exercising
    * non-zero offsets); `inline = true` stores them in the log instead
    * (storageType `"i"`, small-DV shape). The commit carries the
    * protocol upgrade to minReader 3 + `deletionVectors`.
    *
    * Scale shape: matching runs as ONE distributed scan; bitmaps are
    * built and compressed ON EXECUTORS (`groupByKey` on the file path —
    * each task holds one file's bitmap); the driver collects only the
    * already-serialized DV bytes, i.e. exactly the bytes any writer must
    * hold to emit the single shared `.bin` file. Returns the count of
    * newly deleted rows (rows already dead in a prior DV don't recount).
    *
    * Partitioned tables refuse: the predicate would need the import-side
    * partition-column restoration join; write descriptors via
    * [[writeCommit]]'s `dvs` parameter for those layouts.
    */
  def deleteWhere(
      spark: SparkSession, deltaDir: String, version: Long,
      predicate: org.apache.spark.sql.Column,
      inline: Boolean = false): Long = {
    import org.apache.spark.sql.functions.{col, regexp_replace}
    import org.apache.spark.sql.types.{DataType, StructType}
    val root = Paths.get(deltaDir)
    val logDir = root.resolve("_delta_log")
    require(Files.isDirectory(logDir), s"no _delta_log under $deltaDir")
    val st = resolveState(spark, root, logDir, deltaDir)
    require(st.partCols.isEmpty,
      "deleteWhere supports unpartitioned tables; partitioned layouts need " +
        "the partition-restoration join — attach descriptors via writeCommit(dvs=...)")
    require(st.cmMode.isEmpty,
      "deleteWhere on a column-mapped table is out of scope: the predicate " +
        "names logical columns but the scan below reads physical files — " +
        "import + rewrite, or attach descriptors via writeCommit(dvs=...)")
    val schema = DataType.fromJson(st.schemaJson).asInstanceOf[StructType]
    val files = st.active.toSeq
    val absToRel = files.map { case (rel, _) =>
      root.resolve(rel).toString -> rel }.toMap
    val paths = absToRel.keys.toSeq.sorted

    import spark.implicits._
    // match on the RAW scan: a previously-deleted row re-matching is
    // harmless — the merged bitmap is a superset either way
    val matched: Array[(String, Array[Byte], Long)] =
      spark.read.schema(schema).parquet(paths: _*)
        .withColumn("__graft_dv_path",
          regexp_replace(col("_metadata.file_path"), "^file:/+", "/"))
        .withColumn("__graft_dv_pos", col("_metadata.row_index"))
        .filter(predicate)
        .select(col("__graft_dv_path").as[String], col("__graft_dv_pos").as[Long])
        .groupByKey(_._1)
        .mapGroups { (p, it) =>
          val rows = it.map(_._2).toArray
          (p, DeletionVectors.serializeBitmapArray(rows), rows.length.toLong)
        }
        .collect()
        .sortBy(_._1)
    if (matched.isEmpty) {
      writeCommit(deltaDir, version, adds = Nil) // empty commit keeps versions contiguous
      return 0L
    }

    // merge each touched file's existing DV (delete-scale driver work —
    // the same bytes the new .bin must contain)
    val merged: Seq[(String, Array[Long], Long)] = matched.toSeq.map {
      case (abs, bytes, _) =>
        val rel = absToRel.getOrElse(abs,
          throw new IllegalStateException(s"matched rows in unknown file $abs"))
        val fresh = DeletionVectors.deserializeBitmapArray(bytes)
        val old = st.active(rel).dv
          .map(d => DeletionVectors.deletedRows(root, d)).getOrElse(Array.empty[Long])
        val union = (old ++ fresh).distinct.sorted
        (rel, union, union.length.toLong - old.length.toLong)
    }
    val payloads = merged.map { case (_, rows, _) =>
      DeletionVectors.serializeBitmapArray(rows) }
    val descriptors: Map[String, DeletionVectors.DvDescriptor] =
      if (inline)
        merged.zip(payloads).map { case ((rel, rows, _), p) =>
          rel -> DeletionVectors.DvDescriptor(
            "i", DeletionVectors.z85EncodePadded(p), None, p.length, rows.length.toLong)
        }.toMap
      else {
        val (pathOrInline, placements) = DeletionVectors.writeDvFile(root, payloads)
        merged.zip(placements).map { case ((rel, rows, _), pl) =>
          rel -> DeletionVectors.DvDescriptor(
            "u", pathOrInline, Some(pl.offset), pl.sizeInBytes, rows.length.toLong)
        }.toMap
      }
    val touched = merged.map(_._1)
    writeCommit(deltaDir, version, adds = touched, removes = touched,
      dvs = descriptors)
    merged.map(_._3).sum
  }

  /** Purge deletion vectors (the Delta `REORG TABLE ... APPLY (PURGE)`
    * maintenance op): every file carrying a DV is rewritten WITHOUT its
    * dead rows and re-committed clean, so accumulated mask overhead
    * (every read pays the anti-join) converts back into plain scans.
    * Untouched files are untouched — work is O(DV'd files), never
    * O(table). Row order within a rewritten file is preserved (the scan
    * order of the source file), the old `.bin` payloads become
    * unreferenced (vacuum-able), and the commit is remove+add per
    * rewritten file. Returns the number of files rewritten.
    */
  def purgeDeletionVectors(
      spark: SparkSession, deltaDir: String, version: Long): Int = {
    import org.apache.spark.sql.functions.{broadcast, col}
    import org.apache.spark.sql.types.{DataType, StructType}
    import scala.jdk.CollectionConverters._
    val root = Paths.get(deltaDir)
    val logDir = root.resolve("_delta_log")
    require(Files.isDirectory(logDir), s"no _delta_log under $deltaDir")
    val st = resolveState(spark, root, logDir, deltaDir)
    require(st.partCols.isEmpty,
      "purgeDeletionVectors supports unpartitioned tables (the deleteWhere scope)")
    val schema = DataType.fromJson(st.schemaJson).asInstanceOf[StructType]
    val dvd = st.active.toSeq.collect { case (rel, af) if af.dv.isDefined => (rel, af) }
    if (dvd.isEmpty) {
      writeCommit(deltaDir, version, adds = Nil)
      return 0
    }
    // ONE distributed pass over only the DV'd files: mask via the import's
    // executor-parsed anti-join, then the writeShards one-file-per-key
    // shape — hash repartition on the source-file index + partitionBy puts
    // each rewritten file wholly in one task, rows in their original
    // row_index order
    val absFiles = dvd.map { case (rel, af) => (root.resolve(rel), af) }
    val scan = spark.read.schema(schema)
      .parquet(absFiles.map(_._1.toString): _*)
    val masked = applyDeletionVectors(spark, root, scan, absFiles)
    val idxRows = dvd.zipWithIndex.map { case ((rel, _), i) =>
      org.apache.spark.sql.Row(root.resolve(rel).toString, i) }
    val idxSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__graft_dv_path",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("__graft_pidx",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
    val idxDf = spark.createDataFrame(idxRows.asJava, idxSchema)
    val tmp = Files.createTempDirectory("graft_dv_purge_")
    masked.join(broadcast(idxDf), Seq("__graft_dv_path"))
      .repartition(dvd.size, col("__graft_pidx"))
      .sortWithinPartitions(col("__graft_pidx"), col("__graft_dv_pos"))
      .select((schema.fieldNames.map(col) :+ col("__graft_pidx")).toIndexedSeq: _*)
      .write.mode("overwrite").partitionBy("__graft_pidx").parquet(tmp.toString)
    val renames = Seq.newBuilder[(String, String)]
    val removedOnly = Seq.newBuilder[String]
    dvd.zipWithIndex.foreach { case ((rel, _), i) =>
      val dir = tmp.resolve(s"__graft_pidx=$i")
      if (!Files.isDirectory(dir)) removedOnly += rel // fully-dead file: just retire
      else {
        val part = listParquet(dir) match {
          case Seq(one) => one
          case other => throw new IllegalStateException(
            s"expected one purged part file for $rel, got ${other.size}")
        }
        val cleanRel = s"${rel.stripSuffix(".parquet")}-purged-$version.parquet"
        Files.move(part, root.resolve(cleanRel), StandardCopyOption.REPLACE_EXISTING)
        renames += ((rel, cleanRel))
      }
    }
    val rn = renames.result()
    writeCommit(deltaDir, version, adds = rn.map(_._2),
      removes = rn.map(_._1) ++ removedOnly.result())
    dvd.size
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
    val dvType = StructType(Seq(
      StructField("storageType", StringType),
      StructField("pathOrInlineDv", StringType),
      StructField("offset", IntegerType),
      StructField("sizeInBytes", IntegerType),
      StructField("cardinality", LongType)))
    val cpSchema = StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType),
        StructField("readerFeatures", ArrayType(StringType)),
        StructField("writerFeatures", ArrayType(StringType))))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("format", StructType(Seq(StructField("provider", StringType)))),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        // configuration MUST survive the checkpoint: dropping
        // delta.columnMapping.mode would make the next import read the
        // logical names against physical files — all-NULL silent loss
        StructField("configuration", pvType),
        StructField("createdTime", LongType)))),
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", pvType),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("dataChange", BooleanType),
        // deletionVector rides IN the checkpoint add rows (PROTOCOL.md
        // checkpoint schema) — dropping it here would resurrect every
        // checkpointed delete on the next import
        StructField("deletionVector", dvType))))))
    val now = System.currentTimeMillis()
    val features =
      if (st.readerFeatures.isEmpty) null else st.readerFeatures.toSeq.sorted
    val protoRow = SRow(SRow(st.minReader, st.minWriter, features, features), null, null)
    val mdRow = SRow(null, SRow(java.util.UUID.randomUUID().toString,
      SRow("parquet"), st.schemaJson, st.partCols, st.configuration, now), null)
    val addRows = st.active.toSeq.map { case (path, af) =>
      val dvRow = af.dv.map(d =>
        SRow(d.storageType, d.pathOrInlineDv,
          d.offset.map(Integer.valueOf).orNull, d.sizeInBytes,
          d.cardinality)).orNull
      SRow(null, null, SRow(path, af.pv.map { case (k, v) => k -> v.orNull },
        af.size, now, true, dvRow))
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
