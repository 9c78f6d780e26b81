package graft.storage

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

import graft.SparkSpec

/** The Delta bridge: an exported snapshot must (a) read back identically
  * with a plain parquet reader, (b) carry a structurally valid first
  * Delta commit — protocol, metaData whose schemaString parses to the
  * exported schema, and one add per data file with the real on-disk
  * size — the three mandatory actions of delta.io PROTOCOL.md's v0
  * snapshot.
  */
class DeltaInteropSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def logActions(outDir: String) = {
    val commit = Paths.get(outDir, "_delta_log", "00000000000000000000.json")
    assert(Files.exists(commit), "first commit file must exist")
    Files.readAllLines(commit).asScala.filter(_.nonEmpty)
      .map(mapper.readTree(_)).toSeq
  }

  test("append table: files copied verbatim, log adds match disk, parquet read-back equal") {
    val table = tmp("delta_src_") + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .coalesce(1).write.parquet(table + "_w1")
    VersionedTable.append(table)(dir =>
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1).write.parquet(dir))
    VersionedTable.append(table)(dir =>
      Seq((3L, "c")).toDF("id", "v").coalesce(1).write.parquet(dir))

    val out = tmp("delta_out_")
    val rels = DeltaInterop.exportSnapshot(spark, table, out)
    assert(rels.size == 2, "one copied file per committed segment")

    // plain parquet read-back: same rows (the _delta_log dir is hidden)
    val got = spark.read.parquet(out).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")))

    val actions = logActions(out)
    val protocol = actions.flatMap(a => Option(a.get("protocol")))
    assert(protocol.size == 1 && protocol.head.get("minReaderVersion").asInt() == 1)
    val meta = actions.flatMap(a => Option(a.get("metaData")))
    assert(meta.size == 1)
    val schema = DataType.fromJson(meta.head.get("schemaString").asText())
      .asInstanceOf[StructType]
    assert(schema.fieldNames.toSeq == Seq("id", "v"))
    assert(meta.head.get("format").get("provider").asText() == "parquet")
    val adds = actions.flatMap(a => Option(a.get("add")))
    assert(adds.size == 2)
    adds.foreach { add =>
      val p = Paths.get(out, add.get("path").asText())
      assert(Files.exists(p), s"add.path must exist: $p")
      assert(Files.size(p) == add.get("size").asLong(), "add.size must match disk")
      assert(add.get("dataChange").asBoolean())
    }
    assert(adds.map(_.get("path").asText()).toSet == rels.toSet)
  }

  test("upsert table: the exported snapshot is the MERGED view") {
    val table = tmp("delta_ups_") + "/t"
    def w(df: org.apache.spark.sql.DataFrame)(dir: String): Unit =
      df.coalesce(1).write.parquet(dir)
    VersionedTable.upsert(spark, table, Seq("id"),
      compactWrite = (df, dir) => w(df)(dir))(
      w(Seq((1L, "old"), (2L, "keep")).toDF("id", "v")))
    VersionedTable.upsert(spark, table, Seq("id"),
      compactWrite = (df, dir) => w(df)(dir))(
      w(Seq((1L, "new")).toDF("id", "v")))

    val out = tmp("delta_out_ups_")
    DeltaInterop.exportSnapshot(spark, table, out)
    val got = spark.read.parquet(out).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "new"), (2L, "keep")),
      "export must serve latest-wins merged rows, not raw segment rows")
    // merged view must also equal VersionedTable.read exactly
    val vt = VersionedTable.read(spark, table).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == vt)
    val adds = logActions(out).flatMap(a => Option(a.get("add")))
    assert(adds.nonEmpty)
  }

  test("partitioned segments (writeShards layout) take the materialize path with columns restored") {
    val root = tmp("delta_shard_")
    val docs = (0L until 50L).map(i => (i, Seq.fill((i % 5 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    graft.functions.ShardExport.writeShards(docs, "doc_id", "text", 4, 20L, root)
    val out = tmp("delta_out_shard_")
    DeltaInterop.exportSnapshot(spark, root + "/data", out)
    val got = spark.read.parquet(out)
    // the pb/ps partition columns survive as DATA columns in the export
    assert(got.columns.contains("pb") && got.columns.contains("ps"))
    assert(got.count() == 50L)
    val vt = VersionedTable.read(spark, root + "/data")
    assert(got.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      vt.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("importSnapshot round-trips an export: merged rows, schema preserved") {
    val table = tmp("delta_rt_") + "/t"
    def w(df: org.apache.spark.sql.DataFrame)(dir: String): Unit =
      df.coalesce(1).write.parquet(dir)
    VersionedTable.upsert(spark, table, Seq("id"),
      compactWrite = (df, dir) => w(df)(dir))(
      w(Seq((1L, "old"), (2L, "keep"), (3L, "x")).toDF("id", "v")))
    VersionedTable.upsert(spark, table, Seq("id"),
      compactWrite = (df, dir) => w(df)(dir))(
      w(Seq((1L, "new")).toDF("id", "v")))
    val out = tmp("delta_out_rt_")
    DeltaInterop.exportSnapshot(spark, table, out)

    val imp = DeltaInterop.importSnapshot(spark, out)
    assert(imp.schema.fieldNames.toSeq == Seq("id", "v"))
    val got = imp.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = VersionedTable.read(spark, table).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want, "import must serve exactly the exported snapshot")
  }

  test("importSnapshot replays a multi-commit foreign log: remove retires the file") {
    val out = tmp("delta_foreign_")
    val f1 = Paths.get(out, "a.parquet"); val f2 = Paths.get(out, "b.parquet")
    Seq((1L, "a")).toDF("id", "v").coalesce(1).write.parquet(out + "_w1")
    // write two single-file parquet payloads with known names
    def onePart(df: org.apache.spark.sql.DataFrame, dst: java.nio.file.Path): Unit = {
      val t = tmp("delta_part_")
      df.coalesce(1).write.mode("overwrite").parquet(t)
      val part = Files.list(Paths.get(t)).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).next()
      Files.copy(part, dst)
    }
    onePart(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), f1)
    onePart(Seq((3L, "c")).toDF("id", "v"), f2)
    val logDir = Paths.get(out, "_delta_log"); Files.createDirectories(logDir)
    val schemaJson = Seq((1L, "a")).toDF("id", "v").schema.json
      .replace("\"", "\\\"")
    def add(p: java.nio.file.Path) =
      s"""{"add":{"path":"${p.getFileName}","partitionValues":{},"size":${Files.size(p)},"modificationTime":0,"dataChange":true}}"""
    Files.write(logDir.resolve("00000000000000000000.json"),
      (s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
          |{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{}}}
          |${add(f1)}
          |${add(f2)}
          |""".stripMargin).getBytes("UTF-8"))
    // commit 1: retire b.parquet
    Files.write(logDir.resolve("00000000000000000001.json"),
      s"""{"remove":{"path":"b.parquet","dataChange":true}}\n""".getBytes("UTF-8"))
    val got = DeltaInterop.importSnapshot(spark, out).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b")), "removed file must not be served")
  }

  test("schema evolution mid-log: pre-evolution files null-fill the added column") {
    val out = tmp("delta_evo_")
    val f1 = Paths.get(out, "a.parquet"); val f2 = Paths.get(out, "b.parquet")
    def onePart(df: org.apache.spark.sql.DataFrame, dst: java.nio.file.Path): Unit = {
      val t = tmp("delta_part_")
      df.coalesce(1).write.mode("overwrite").parquet(t)
      val part = Files.list(Paths.get(t)).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).next()
      Files.copy(part, dst)
    }
    val dfOld = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val dfNew = Seq((3L, "c", 30L)).toDF("id", "v", "extra")
    onePart(dfOld, f1)
    DeltaInterop.writeCommit(out, 0L, adds = Seq("a.parquet"),
      schemaJson = Some(dfOld.schema.json))
    onePart(dfNew, f2)
    DeltaInterop.writeCommit(out, 1L, adds = Seq("b.parquet"),
      schemaJson = Some(dfNew.schema.json)) // ALTER TABLE ADD COLUMN
    val got = DeltaInterop.importSnapshot(spark, out)
    assert(got.schema.fieldNames.toSeq == Seq("id", "v", "extra"),
      "last-wins metaData must win the read schema")
    val rows = got.collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(rows == Set((1L, "a", None), (2L, "b", None), (3L, "c", Some(30L))))
  }

  private def mappedField(name: String, dt: org.apache.spark.sql.types.DataType,
      id: Long, phys: String): org.apache.spark.sql.types.StructField =
    org.apache.spark.sql.types.StructField(name, dt, nullable = true,
      new org.apache.spark.sql.types.MetadataBuilder()
        .putLong("delta.columnMapping.id", id)
        .putString("delta.columnMapping.physicalName", phys).build())

  test("id-mode column mapping: columns resolve by parquet field id (names match " +
      "NOTHING); rename is metadata-only; configuration survives a checkpoint") {
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val out = tmp("delta_cmid_")
    def fid(id: Long): Metadata =
      new MetadataBuilder().putLong("parquet.field.id", id).build()
    // the data files' physical column names ('w*') match neither the
    // logical schema nor the metadata physicalName ('col-p*') — the
    // Iceberg-compat drift — so only FIELD-ID resolution can read them;
    // the nested struct proves ids resolve at depth too
    def physDf(rows: Seq[(Long, String, Long)]) = rows.toDF("a", "b", "c")
      .select(col("a").as("w1", fid(1)), col("b").as("w2", fid(2)),
        struct(col("c").as("wn", fid(4))).as("w3", fid(3)))
    val nested = StructType(Seq(mappedField("inner", LongType, 4, "col-n1")))
    val v0 = StructType(Seq(
      mappedField("doc_id", LongType, 1, "col-p1"),
      mappedField("lang", StringType, 2, "col-p2"),
      mappedField("s", nested, 3, "col-p3")))
    val v1 = StructType(Seq(
      mappedField("doc_id", LongType, 1, "col-p1"),
      mappedField("language", StringType, 2, "col-p2"), // rename, same id
      mappedField("s", nested, 3, "col-p3")))
    val conf = Map("delta.columnMapping.mode" -> "id",
      "delta.columnMapping.maxColumnId" -> "4")
    onePartFile(physDf(Seq((1L, "en", 10L), (2L, "de", 20L))),
      Paths.get(out, "a.parquet"))
    DeltaInterop.writeCommit(out, 0L, adds = Seq("a.parquet"),
      schemaJson = Some(v0.json), configuration = conf,
      protocolVersions = Some((2, 5)))
    onePartFile(physDf(Seq((3L, "fr", 30L))), Paths.get(out, "b.parquet"))
    DeltaInterop.writeCommit(out, 1L, adds = Seq("b.parquet"),
      schemaJson = Some(v1.json), configuration = conf)
    def readAll() = {
      val df = DeltaInterop.importSnapshot(spark, out)
      assert(df.schema.fieldNames.toSeq == Seq("doc_id", "language", "s"))
      df.select(col("doc_id"), col("language"), col("s.inner")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    }
    val want = Set((1L, "en", 10L), (2L, "de", 20L), (3L, "fr", 30L))
    assert(readAll() == want)
    // checkpoint, drop the JSON commits: the id mode must ride in the
    // checkpoint metaData or the re-read would resolve by (wrong) names
    DeltaInterop.writeCheckpoint(spark, out, 1L)
    Files.delete(Paths.get(out, "_delta_log", "00000000000000000000.json"))
    Files.delete(Paths.get(out, "_delta_log", "00000000000000000001.json"))
    assert(readAll() == want)
    // a field missing its declared id refuses rather than guessing
    val bare = StructType(Seq(StructField("doc_id", LongType),
      StructField("language", StringType)))
    val logDir = Paths.get(out, "_delta_log")
    val cp = spark.read.parquet(logDir.resolve(
      f"${1L}%020d.checkpoint.parquet").toString)
    assert(cp.filter(col("metaData").isNotNull).count() == 1) // sanity
    val outBad = tmp("delta_cmid_bad_")
    onePartFile(physDf(Seq((1L, "en", 10L))).select(col("w1"), col("w2")),
      Paths.get(outBad, "a.parquet"))
    DeltaInterop.writeCommit(outBad, 0L, adds = Seq("a.parquet"),
      schemaJson = Some(bare.json),
      configuration = Map("delta.columnMapping.mode" -> "id"),
      protocolVersions = Some((2, 5)))
    val e = intercept[IllegalArgumentException] {
      DeltaInterop.importSnapshot(spark, outBad).collect()
    }
    assert(e.getMessage.contains("delta.columnMapping"), e.getMessage)
  }

  test("minReaderVersion 2 without name-mode mapping refuses (capability we lack)") {
    val out = tmp("delta_v2bare_")
    val f1 = Paths.get(out, "a.parquet")
    onePartFile(Seq((1L, "a")).toDF("id", "v"), f1)
    val logDir = Paths.get(out, "_delta_log"); Files.createDirectories(logDir)
    val schemaJson = Seq((1L, "a")).toDF("id", "v").schema.json
      .replace("\"", "\\\"")
    Files.write(logDir.resolve("00000000000000000000.json"),
      (s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}
          |{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{}}}
          |{"add":{"path":"a.parquet","partitionValues":{},"size":${Files.size(f1)},"modificationTime":0,"dataChange":true}}
          |""".stripMargin).getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      DeltaInterop.importSnapshot(spark, out).collect()
    }
    assert(e.getMessage.contains("minReaderVersion 2"), e.getMessage)
  }

  test("name-mode mapping: physical files serve logical names; rename is metadata-only; " +
      "configuration survives a checkpoint") {
    import org.apache.spark.sql.types._
    val out = tmp("delta_cmname_")
    def physDf(rows: Seq[(Long, String, Long)]) = rows.toDF("a", "b", "c")
      .select(col("a").as("col-p1"), col("b").as("col-p2"),
        struct(col("c").as("col-n1")).as("col-p3"))
    val nested = StructType(Seq(mappedField("inner", LongType, 4, "col-n1")))
    val v0 = StructType(Seq(
      mappedField("doc_id", LongType, 1, "col-p1"),
      mappedField("lang", StringType, 2, "col-p2"),
      mappedField("s", nested, 3, "col-p3")))
    val v1 = StructType(Seq(
      mappedField("doc_id", LongType, 1, "col-p1"),
      mappedField("language", StringType, 2, "col-p2"), // rename, same physical
      mappedField("s", nested, 3, "col-p3")))
    val conf = Map("delta.columnMapping.mode" -> "name",
      "delta.columnMapping.maxColumnId" -> "4")
    onePartFile(physDf(Seq((1L, "en", 10L), (2L, "de", 20L))),
      Paths.get(out, "a.parquet"))
    DeltaInterop.writeCommit(out, 0L, adds = Seq("a.parquet"),
      schemaJson = Some(v0.json), configuration = conf,
      protocolVersions = Some((2, 5)))
    onePartFile(physDf(Seq((3L, "fr", 30L))), Paths.get(out, "b.parquet"))
    DeltaInterop.writeCommit(out, 1L, adds = Seq("b.parquet"),
      schemaJson = Some(v1.json), configuration = conf)
    def readAll() = {
      val df = DeltaInterop.importSnapshot(spark, out)
      assert(df.schema.fieldNames.toSeq == Seq("doc_id", "language", "s"))
      assert(df.schema("s").dataType.asInstanceOf[StructType]
        .fieldNames.toSeq == Seq("inner"))
      df.select(col("doc_id"), col("language"), col("s.inner")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    }
    val want = Set((1L, "en", 10L), (2L, "de", 20L), (3L, "fr", 30L))
    assert(readAll() == want)
    // checkpoint, drop the JSON commits: the mapping mode must ride in the
    // checkpoint metaData or the re-read would serve all-NULL columns
    DeltaInterop.writeCheckpoint(spark, out, 1L)
    Files.delete(Paths.get(out, "_delta_log", "00000000000000000000.json"))
    Files.delete(Paths.get(out, "_delta_log", "00000000000000000001.json"))
    assert(readAll() == want)
    // and deleteWhere refuses a mapped table rather than matching wrong columns
    val e = intercept[IllegalArgumentException] {
      DeltaInterop.deleteWhere(spark, out, 2L, col("doc_id") === 1L)
    }
    assert(e.getMessage.contains("column-mapped"), e.getMessage)
  }

  test("importSnapshot restores typed partition columns from add.partitionValues") {
    val out = tmp("delta_pv_")
    def onePart(df: org.apache.spark.sql.DataFrame, dst: java.nio.file.Path): Unit = {
      val t = tmp("delta_part_")
      df.coalesce(1).write.mode("overwrite").parquet(t)
      val part = Files.list(Paths.get(t)).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).next()
      Files.copy(part, dst)
    }
    // data files carry only (id, v); bucket lives in the log
    val f1 = Paths.get(out, "p1.parquet"); val f2 = Paths.get(out, "p2.parquet")
    onePart(Seq((1L, "a")).toDF("id", "v"), f1)
    onePart(Seq((2L, "b")).toDF("id", "v"), f2)
    val full = StructType(DataType.fromJson(Seq((1L, "a")).toDF("id", "v").schema.json)
      .asInstanceOf[StructType].fields :+
      org.apache.spark.sql.types.StructField("bucket", org.apache.spark.sql.types.IntegerType))
    val schemaJson = full.json.replace("\"", "\\\"")
    val logDir = Paths.get(out, "_delta_log"); Files.createDirectories(logDir)
    Files.write(logDir.resolve("00000000000000000000.json"),
      (s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
          |{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":["bucket"],"configuration":{}}}
          |{"add":{"path":"p1.parquet","partitionValues":{"bucket":"7"},"size":${Files.size(f1)},"modificationTime":0,"dataChange":true}}
          |{"add":{"path":"p2.parquet","partitionValues":{"bucket":null},"size":${Files.size(f2)},"modificationTime":0,"dataChange":true}}
          |""".stripMargin).getBytes("UTF-8"))
    val imp = DeltaInterop.importSnapshot(spark, out)
    assert(imp.schema.fieldNames.toSeq == Seq("id", "v", "bucket"))
    assert(imp.schema("bucket").dataType == org.apache.spark.sql.types.IntegerType)
    val got = imp.collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) None else Some(r.getInt(2)))).toSet
    assert(got == Set((1L, "a", Some(7)), (2L, "b", None)))
  }

  test("importSnapshot catches a size mismatch (corruption gate)") {
    val table = tmp("delta_corrupt_") + "/t"
    VersionedTable.append(table)(dir =>
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1).write.parquet(dir))
    val out = tmp("delta_out_corrupt_")
    val rels = DeltaInterop.exportSnapshot(spark, table, out)
    val victim = Paths.get(out, rels.head)
    Files.write(victim, Files.readAllBytes(victim) ++ Array[Byte](0))
    val ex = intercept[IllegalArgumentException] {
      DeltaInterop.importSnapshot(spark, out)
    }
    assert(ex.getMessage.contains("size mismatch"))
    // verifySizes=false skips the gate: plan construction succeeds (the
    // explicit schema means no file is touched until scan time)
    DeltaInterop.importSnapshot(spark, out, verifySizes = false)
  }

  test("importSnapshot randomized log replay: served set equals a reference fold") {
    val rnd = new scala.util.Random(42)
    def onePart(df: org.apache.spark.sql.DataFrame, dst: java.nio.file.Path): Unit = {
      val t = tmp("delta_fz_part_")
      df.coalesce(1).write.mode("overwrite").parquet(t)
      val part = Files.list(Paths.get(t)).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).next()
      Files.copy(part, dst)
    }
    for (scenario <- 0 until 5) {
      val out = tmp(s"delta_fuzz_${scenario}_")
      val nFiles = 2 + rnd.nextInt(4)
      val fileRows = (0 until nFiles).map { f =>
        f -> (0 until (1 + rnd.nextInt(3))).map(r => (scenario * 1000L + f * 10L + r, s"v$f-$r"))
      }.toMap
      fileRows.foreach { case (f, rows) =>
        onePart(rows.toDF("id", "v"), Paths.get(out, s"f$f.parquet")) }
      val schemaJson = Seq((1L, "x")).toDF("id", "v").schema.json.replace("\"", "\\\"")
      // random action script over 1-3 commits: adds in commit order,
      // removes may retire earlier adds; reference fold = add/remove
      // last-wins per path
      val active = scala.collection.mutable.LinkedHashSet.empty[Int]
      val logDir = Paths.get(out, "_delta_log"); Files.createDirectories(logDir)
      val nCommits = 1 + rnd.nextInt(3)
      var pending = (0 until nFiles).toList
      for (c <- 0 until nCommits) {
        val sb = new StringBuilder
        if (c == 0) {
          sb.append("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""").append('\n')
          sb.append(s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{}}}""").append('\n')
        }
        // add some pending files
        val toAdd = pending.take(1 + rnd.nextInt(math.max(1, pending.size)))
        pending = pending.drop(toAdd.size)
        toAdd.foreach { f =>
          val p = Paths.get(out, s"f$f.parquet")
          sb.append(s"""{"add":{"path":"f$f.parquet","partitionValues":{},"size":${Files.size(p)},"modificationTime":0,"dataChange":true}}""").append('\n')
          active += f
        }
        // maybe remove one active file
        if (active.nonEmpty && rnd.nextBoolean()) {
          val victim = active.toSeq(rnd.nextInt(active.size))
          sb.append(s"""{"remove":{"path":"f$victim.parquet","dataChange":true}}""").append('\n')
          active -= victim
        }
        Files.write(logDir.resolve(f"$c%020d.json"), sb.toString.getBytes("UTF-8"))
      }
      // half the scenarios also checkpoint a random prefix (sometimes
      // multi-part): the served set must be identical with the base state
      // coming from the checkpoint instead of the early commits
      if (rnd.nextBoolean())
        DeltaInterop.writeCheckpoint(spark, out, rnd.nextInt(nCommits).toLong,
          parts = 1 + rnd.nextInt(2))
      val got = DeltaInterop.importSnapshot(spark, out).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val want = active.toSet.flatMap(fileRows)
      assert(got == want, s"scenario $scenario: got $got want $want (active=$active)")
    }
  }

  // ---- checkpointed logs (real tables checkpoint every ~10 commits) ----

  private def onePartFile(df: org.apache.spark.sql.DataFrame, dst: java.nio.file.Path): Unit = {
    val t = tmp("delta_cp_part_")
    df.coalesce(1).write.mode("overwrite").parquet(t)
    val part = Files.list(Paths.get(t)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).next()
    Files.copy(part, dst)
    ()
  }

  /** commits 0..2 over four files, checkpoint at 1: f1,f2 added at v0;
    * v1 removes f2, adds f3; v2 (the tail) removes f1, adds f4 — final
    * active set {f3, f4}.
    */
  private def checkpointedTable(parts: Int): String = {
    val out = tmp("delta_cp_")
    onePartFile(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), Paths.get(out, "f1.parquet"))
    onePartFile(Seq((3L, "c")).toDF("id", "v"), Paths.get(out, "f2.parquet"))
    onePartFile(Seq((4L, "d")).toDF("id", "v"), Paths.get(out, "f3.parquet"))
    onePartFile(Seq((5L, "e")).toDF("id", "v"), Paths.get(out, "f4.parquet"))
    val schemaJson = Seq((1L, "x")).toDF("id", "v").schema.json
    DeltaInterop.writeCommit(out, 0L, adds = Seq("f1.parquet", "f2.parquet"),
      schemaJson = Some(schemaJson))
    DeltaInterop.writeCommit(out, 1L, adds = Seq("f3.parquet"), removes = Seq("f2.parquet"))
    DeltaInterop.writeCheckpoint(spark, out, 1L, parts = parts)
    DeltaInterop.writeCommit(out, 2L, adds = Seq("f4.parquet"), removes = Seq("f1.parquet"))
    out
  }

  test("checkpoint + tail: base state from the checkpoint, tail remove retires a checkpointed add") {
    val out = checkpointedTable(parts = 1)
    // delete the compacted commits: the base state can ONLY come from the
    // checkpoint parquet — this is what makes long-log open O(tail)
    Files.delete(Paths.get(out, "_delta_log", "00000000000000000000.json"))
    Files.delete(Paths.get(out, "_delta_log", "00000000000000000001.json"))
    val got = DeltaInterop.importSnapshot(spark, out).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((4L, "d"), (5L, "e")),
      "tail remove must retire the checkpoint-added f1; f3 (checkpoint) + f4 (tail) served")
  }

  test("multi-part checkpoint reads all parts") {
    val out = checkpointedTable(parts = 3)
    Files.delete(Paths.get(out, "_delta_log", "00000000000000000000.json"))
    Files.delete(Paths.get(out, "_delta_log", "00000000000000000001.json"))
    val ptr = mapper.readTree(Files.readAllBytes(
      Paths.get(out, "_delta_log", "_last_checkpoint")))
    assert(ptr.get("parts").asInt() == 3)
    val got = DeltaInterop.importSnapshot(spark, out).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((4L, "d"), (5L, "e")))
  }

  test("size gate still applies to checkpoint-declared files") {
    val out = checkpointedTable(parts = 1)
    // f3 is active via the CHECKPOINT's add row; truncating it must refuse
    val f3 = Paths.get(out, "f3.parquet")
    val bytes = Files.readAllBytes(f3)
    Files.write(f3, java.util.Arrays.copyOf(bytes, bytes.length - 1))
    val e = intercept[IllegalArgumentException](DeltaInterop.importSnapshot(spark, out))
    assert(e.getMessage.contains("size mismatch"))
  }

  test("a commit gap after the checkpoint refuses loudly") {
    val out = checkpointedTable(parts = 1)
    // hand-write v4, skipping v3 — a reader that shrugs silently
    // time-travels the table to a state that never existed
    Files.write(Paths.get(out, "_delta_log", "00000000000000000004.json"),
      "{\"remove\":{\"path\":\"f4.parquet\",\"dataChange\":true}}\n".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](DeltaInterop.importSnapshot(spark, out))
    assert(e.getMessage.contains("gap"))
  }

  test("writeCommit enforces contiguity and first-commit metaData; missing checkpoint file refuses") {
    val out = tmp("delta_cp_guard_")
    onePartFile(Seq((1L, "a")).toDF("id", "v"), Paths.get(out, "f1.parquet"))
    val schemaJson = Seq((1L, "x")).toDF("id", "v").schema.json
    assert(intercept[IllegalArgumentException](
      DeltaInterop.writeCommit(out, 0L, adds = Seq("f1.parquet")))
      .getMessage.contains("schemaJson"))
    DeltaInterop.writeCommit(out, 0L, adds = Seq("f1.parquet"), schemaJson = Some(schemaJson))
    assert(intercept[IllegalArgumentException](
      DeltaInterop.writeCommit(out, 2L, adds = Nil))
      .getMessage.contains("non-contiguous"))
    // a dangling _last_checkpoint (pointer without the parquet) refuses
    Files.write(Paths.get(out, "_delta_log", "_last_checkpoint"),
      "{\"version\":0,\"size\":3}\n".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](DeltaInterop.importSnapshot(spark, out))
    assert(e.getMessage.contains("missing"))
  }

  test("convertFromIceberg: in-place _delta_log, both bridges agree, identity partitions convert") {
    val root = tmp("i2d_")
    val tab = root + "/t"
    val df = (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v")
    VersionedTable.append(tab)(d =>
      df.filter(col("id") <= 10).coalesce(1).write.parquet(d))
    VersionedTable.append(tab)(d =>
      df.filter(col("id") > 10).coalesce(1).write.parquet(d))
    val ice = root + "/ice"
    IcebergInterop.exportSnapshot(spark, tab, ice)
    val rels = DeltaInterop.convertFromIceberg(spark, ice)
    assert(rels.size == 2 && rels.forall(_.startsWith("data/")),
      s"adds must be table-relative: $rels")
    val viaDelta = DeltaInterop.importSnapshot(spark, ice)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val viaIceberg = IcebergInterop.importSnapshot(spark, ice)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaDelta == df.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
    assert(viaDelta == viaIceberg)
    // identity-partitioned Iceberg tables CONVERT (round 16): the fixture
    // is the Hive-migrated shape — data files LACK the partition column,
    // the value (NULL included) lives only in the manifest partition
    // structs — so the Delta read reconstructs it entirely from
    // add.partitionValues
    val pfix = tmp("i2d_part_")
    val pdf = Seq((1L, "a", "en"), (2L, "b", "de"), (3L, "c", null))
      .toDF("id", "v", "pl")
    IcebergFixtures.writePartitionedV1(spark, pfix, pdf, "pl")
    DeltaInterop.convertFromIceberg(spark, pfix)
    def rows3(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), col("v"), col("pl"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val wantP = Set((1L, "a", "en"), (2L, "b", "de"), (3L, "c", null: String))
    assert(rows3(DeltaInterop.importSnapshot(spark, pfix)) == wantP)
    assert(rows3(IcebergInterop.importSnapshot(spark, pfix)) == wantP,
      "both bridges must agree on the partitioned table")
    // non-identity transforms still refuse: the field is not a column
    val xfix = tmp("i2d_xform_")
    IcebergFixtures.writeTransformPartitionedV1(spark, xfix,
      Seq((1L, "en"), (2L, "de")).toDF("id", "lang"),
      Seq(("id_bucket", "bucket[4]", "id", pmod(col("id"), lit(4L)).cast("int"))))
    val e = intercept[IllegalArgumentException](
      DeltaInterop.convertFromIceberg(spark, xfix))
    assert(e.getMessage.contains("non-identity"))
  }

  test("vacuum: retention window honored, dryRun touches nothing, live files survive") {
    val out = tmp("vac_") + "/t"
    Files.createDirectories(Paths.get(out))
    val df = (1L to 30L).map(i => (i, s"v$i")).toDF("id", "v")
    onePartFile(df.filter(col("id") <= 10), Paths.get(out, "a.parquet"))
    onePartFile(df.filter(col("id") > 10 && col("id") <= 20), Paths.get(out, "b.parquet"))
    DeltaInterop.writeCommit(out, 0L, adds = Seq("a.parquet", "b.parquet"),
      schemaJson = Some(df.schema.json))
    onePartFile(df.filter(col("id") > 20), Paths.get(out, "c.parquet"))
    DeltaInterop.writeCommit(out, 1L, adds = Seq("c.parquet"),
      removes = Seq("a.parquet"))
    onePartFile(df.limit(1), Paths.get(out, "orphan.parquet"))
    // default 7-day retention: the fresh tombstone and orphan both survive
    assert(DeltaInterop.vacuum(spark, out) == Nil)
    assert(Files.exists(Paths.get(out, "a.parquet")))
    // dryRun at retention 0: names both, deletes neither
    assert(DeltaInterop.vacuum(spark, out, retentionMs = 0L, dryRun = true,
      disableRetentionCheck = true)
      == Seq("a.parquet", "orphan.parquet"))
    assert(Files.exists(Paths.get(out, "a.parquet"))
      && Files.exists(Paths.get(out, "orphan.parquet")))
    // real vacuum: exactly those two go, the live set + log stay intact
    assert(DeltaInterop.vacuum(spark, out, retentionMs = 0L,
      disableRetentionCheck = true)
      == Seq("a.parquet", "orphan.parquet"))
    assert(!Files.exists(Paths.get(out, "a.parquet"))
      && !Files.exists(Paths.get(out, "orphan.parquet")))
    val got = DeltaInterop.importSnapshot(spark, out)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == (11L to 30L).map(i => (i, s"v$i")).toSet)
    // idempotent: a second vacuum finds nothing
    assert(DeltaInterop.vacuum(spark, out, retentionMs = 0L,
      disableRetentionCheck = true) == Nil)
    // sub-default retention without the explicit override refuses — a
    // zero window deletes an in-flight writer's files (ADVICE r15)
    val eR = intercept[IllegalArgumentException](
      DeltaInterop.vacuum(spark, out, retentionMs = 0L))
    assert(eR.getMessage.contains("disableRetentionCheck"))
  }

  test("vacuum: percent-encoded live paths resolve to the on-disk file (never orphaned)") {
    // PROTOCOL.md mandates add/remove paths be URL-encoded; an externally
    // written table whose live file name contains a space logs it as
    // 'a%20b.parquet'. Before r16 the raw path missed the on-disk file,
    // it fell out of the live set, and vacuum DELETED a live file.
    val out = tmp("vac_enc_") + "/t"
    Files.createDirectories(Paths.get(out))
    val df = (1L to 5L).map(i => (i, s"v$i")).toDF("id", "v")
    onePartFile(df, Paths.get(out, "a b.parquet"))
    val log = Paths.get(out, "_delta_log")
    Files.createDirectories(log)
    val actions = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":${
        com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
          .writeValueAsString(df.schema.json)},"partitionColumns":[],"configuration":{},"createdTime":0}}""",
      s"""{"add":{"path":"a%20b.parquet","partitionValues":{},"size":${
        Files.size(Paths.get(out, "a b.parquet"))},"modificationTime":0,"dataChange":true}}""")
    Files.write(log.resolve("00000000000000000000.json"),
      actions.mkString("", "\n", "\n").getBytes("UTF-8"))
    // even at retention 0 the encoded live file survives: it decodes into
    // the live set instead of looking like never-logged debris
    assert(DeltaInterop.vacuum(spark, out, retentionMs = 0L,
      disableRetentionCheck = true) == Nil)
    assert(Files.exists(Paths.get(out, "a b.parquet")))
  }

  test("refuses to clobber an existing _delta_log") {
    val table = tmp("delta_ref_") + "/t"
    VersionedTable.append(table)(dir =>
      Seq((1L, "a")).toDF("id", "v").coalesce(1).write.parquet(dir))
    val out = tmp("delta_out_ref_")
    DeltaInterop.exportSnapshot(spark, table, out)
    intercept[IllegalArgumentException] {
      DeltaInterop.exportSnapshot(spark, table, out)
    }
  }
}
