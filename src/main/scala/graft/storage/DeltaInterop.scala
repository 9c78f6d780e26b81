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

  /** Import a Delta-format directory (the inverse bridge): replay every
    * commit-JSON in `_delta_log/` in version order — `metaData` last-wins,
    * `add` activates a file, `remove` retires it (last action per path
    * wins) — and serve the active file set as a DataFrame with the
    * log-declared schema.
    *
    * Scale shape: ONE parquet scan over all active files (not one scan
    * per partition) — partition-column values, which Delta stores in the
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
    * to shard manifests. Checkpoint parquet files (an optimization of
    * long logs) are out of scope: this reader targets bounded-commit
    * interop exports, and refuses a `_last_checkpoint` pointer loudly.
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
    require(!Files.exists(logDir.resolve("_last_checkpoint")),
      s"$deltaDir uses a checkpoint — only pure commit-JSON logs are supported")
    val commits = {
      val s = Files.list(logDir)
      try s.iterator().asScala
        .filter(_.getFileName.toString.matches("\\d{20}\\.json"))
        .toSeq.sortBy(_.getFileName.toString)
      finally s.close()
    }
    require(commits.nonEmpty, s"empty _delta_log under $deltaDir")

    var schemaJson: String = null
    var partCols: Seq[String] = Nil
    // path -> (size, partitionValues); insertion order irrelevant (we sort)
    val active = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Map[String, Option[String]])]
    for (commit <- commits; line <- Files.readAllLines(commit).asScala if line.nonEmpty) {
      val node = mapper.readTree(line)
      Option(node.get("metaData")).foreach { md =>
        schemaJson = md.get("schemaString").asText()
        partCols = Option(md.get("partitionColumns")).toSeq
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
        active.put(add.get("path").asText(), (add.get("size").asLong(), pv))
      }
      Option(node.get("remove")).foreach(rm => active.remove(rm.get("path").asText()))
    }
    require(schemaJson != null, s"log at $deltaDir carries no metaData action")
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
