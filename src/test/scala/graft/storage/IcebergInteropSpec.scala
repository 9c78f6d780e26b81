package graft.storage

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableFileInput}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Iceberg bridge: exports must follow the spec's resolution chain
  * (version-hint → metadata.json → Avro manifest list → Avro manifests →
  * data files) with field-id-annotated Avro schemas, and the import must
  * read ONLY through that chain.
  */
class IcebergInteropSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Manifest/data paths are spec-mandated full `file:` URIs; resolve
    * them (tolerating the relative form on hand-built fixtures). */
  private def ref(out: String, s: String): java.nio.file.Path =
    if (s.startsWith("file:")) Paths.get(java.net.URI.create(s))
    else Paths.get(out).resolve(s)

  private def readAvro(p: java.nio.file.Path): (org.apache.avro.Schema, List[GenericRecord]) = {
    val r = new DataFileReader[GenericRecord](
      new SeekableFileInput(p.toFile), new GenericDatumReader[GenericRecord]())
    try (r.getSchema, r.iterator().asScala.toList) finally r.close()
  }

  test("export emits the spec structures: version hint, metadata.json, avro manifests with field ids") {
    val table = tmp("ice_src_") + "/t"
    VersionedTable.append(table)(dir =>
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1).write.parquet(dir))
    VersionedTable.append(table)(dir =>
      Seq((3L, "c")).toDF("id", "v").coalesce(1).write.parquet(dir))
    val out = tmp("ice_out_")
    val rels = IcebergInterop.exportSnapshot(spark, table, out)
    assert(rels.size == 2, "one copied data file per committed segment")

    val metaDir = Paths.get(out, "metadata")
    assert(new String(Files.readAllBytes(metaDir.resolve("version-hint.text")), "UTF-8").trim == "1")
    val meta = mapper.readTree(Files.readAllBytes(metaDir.resolve("v1.metadata.json")))
    assert(meta.get("format-version").asInt() == 1)
    val snapId = meta.get("current-snapshot-id").asLong()
    val fields = meta.get("schema").get("fields").elements().asScala.toList
    assert(fields.map(_.get("name").asText()) == List("id", "v"))
    assert(fields.map(_.get("id").asInt()) == List(1, 2), "field ids assigned 1..n")

    // manifest list: avro, field-id props, counts correct
    val mlPath = ref(out,
      meta.get("snapshots").elements().asScala
        .find(_.get("snapshot-id").asLong() == snapId).get
        .get("manifest-list").asText())
    val (mlSchema, mlRows) = readAvro(mlPath)
    assert(mlSchema.getField("manifest_path").getObjectProp("field-id") == 500)
    assert(mlSchema.getField("manifest_length").getObjectProp("field-id") == 501)
    assert(mlRows.size == 1)
    assert(mlRows.head.get("added_data_files_count") == 2)
    assert(mlRows.head.get("added_rows_count") == 3L)
    val manPath = ref(out, mlRows.head.get("manifest_path").toString)
    assert(Files.size(manPath) == mlRows.head.get("manifest_length"))

    // manifest: required v1 data_file fields, real sizes and counts
    val (mSchema, mRows) = readAvro(manPath)
    val dfSchema = mSchema.getField("data_file").schema()
    assert(dfSchema.getField("file_path").getObjectProp("field-id") == 100)
    assert(dfSchema.getField("block_size_in_bytes") != null, "v1 requires block_size_in_bytes")
    assert(mRows.size == 2 && mRows.forall(_.get("status") == 1))
    mRows.foreach { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      val p = ref(out, df.get("file_path").toString)
      assert(Files.exists(p))
      assert(Files.size(p) == df.get("file_size_in_bytes"))
    }
    assert(mRows.map(_.get("data_file").asInstanceOf[GenericRecord]
      .get("record_count").asInstanceOf[Long]).sum == 3L)
  }

  test("round trip: keyless rows and schema survive; upsert exports the merged view") {
    val table = tmp("ice_rt_") + "/t"
    def w(df: org.apache.spark.sql.DataFrame)(d: String): Unit = df.write.parquet(d)
    val v1 = Seq((1L, "a", Seq(1.0f, 2.0f)), (2L, "b", Seq(3.0f)))
      .toDF("id", "v", "emb")
    VersionedTable.upsert(spark, table, Seq("id"),
      compactWrite = (df, d) => w(df)(d))(w(v1))
    VersionedTable.upsert(spark, table, Seq("id"),
      compactWrite = (df, d) => w(df)(d))(
      w(Seq((2L, "B2", Seq(9.0f))).toDF("id", "v", "emb")))
    val out = tmp("ice_rt_out_")
    IcebergInterop.exportSnapshot(spark, table, out)
    val got = IcebergInterop.importSnapshot(spark, out)
    assert(got.schema.fieldNames.toSeq == Seq("id", "v", "emb"))
    val rows = got.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[Float](2).toList)).toSet
    assert(rows == Set((1L, "a", List(1.0f, 2.0f)), (2L, "B2", List(9.0f))),
      s"merged view must round-trip: $rows")
  }

  test("size gate: a truncated data file refuses before any read") {
    val table = tmp("ice_gate_") + "/t"
    VersionedTable.append(table)(dir =>
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1).write.parquet(dir))
    val out = tmp("ice_gate_out_")
    val rels = IcebergInterop.exportSnapshot(spark, table, out)
    val victim = ref(out, rels.head)
    val bytes = Files.readAllBytes(victim)
    Files.write(victim, java.util.Arrays.copyOf(bytes, bytes.length - 1))
    val e = intercept[IllegalArgumentException](IcebergInterop.importSnapshot(spark, out))
    assert(e.getMessage.contains("size mismatch"))
  }

  test("DELETED manifest entries (status 2) are not served") {
    val table = tmp("ice_del_") + "/t"
    VersionedTable.append(table)(dir =>
      Seq((1L, "a")).toDF("id", "v").coalesce(1).write.parquet(dir))
    VersionedTable.append(table)(dir =>
      Seq((2L, "b")).toDF("id", "v").coalesce(1).write.parquet(dir))
    val out = tmp("ice_del_out_")
    IcebergInterop.exportSnapshot(spark, table, out)
    // rewrite the manifest with one entry flipped to DELETED, preserving
    // the avro schema the export wrote
    val meta = mapper.readTree(Files.readAllBytes(
      Paths.get(out, "metadata", "v1.metadata.json")))
    val mlPath = ref(out,
      meta.get("snapshots").elements().asScala.next().get("manifest-list").asText())
    val (_, mlRows) = readAvro(mlPath)
    val manPath = ref(out, mlRows.head.get("manifest_path").toString)
    val (schema, rows) = readAvro(manPath)
    // flip the entry whose file holds id=2
    val flipped = rows.map { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      val holds2 = spark.read.parquet(
        ref(out, df.get("file_path").toString).toString)
        .filter(col("id") === 2L).count() > 0
      if (holds2) e.put("status", 2)
      e
    }
    val wtr = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    Files.delete(manPath)
    wtr.create(schema, manPath.toFile)
    try flipped.foreach(wtr.append) finally wtr.close()

    val got = IcebergInterop.importSnapshot(spark, out).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a")), s"deleted entry must not be served: $got")
  }

  test("convertFromDelta: metadata-only, both bridges serve the same rows, refusals hold") {
    val out = tmp("d2i_") + "/t"
    Files.createDirectories(Paths.get(out))
    def onePart(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val t = Files.createTempDirectory("d2i_part_")
      df.coalesce(1).write.mode("overwrite").parquet(t.toString)
      val part = Files.list(t).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).next()
      Files.move(part, Paths.get(out, name))
      ()
    }
    val df = (1L to 30L).map(i => (i, s"v$i")).toDF("id", "v")
    onePart(df.filter(col("id") <= 10), "a.parquet")
    onePart(df.filter(col("id") > 10 && col("id") <= 20), "b.parquet")
    DeltaInterop.writeCommit(out, 0L, adds = Seq("a.parquet", "b.parquet"),
      schemaJson = Some(df.schema.json))
    onePart(df.filter(col("id") > 20), "c.parquet")
    DeltaInterop.writeCommit(out, 1L, adds = Seq("c.parquet"),
      removes = Seq("a.parquet"))
    val dataBytesBefore = Seq("a", "b", "c")
      .map(n => Files.size(Paths.get(out, s"$n.parquet")))
    IcebergInterop.convertFromDelta(spark, out)
    // zero data movement: the same three files, byte-identical
    assert(Seq("a", "b", "c").map(n =>
      Files.size(Paths.get(out, s"$n.parquet"))) == dataBytesBefore)
    val viaIceberg = IcebergInterop.importSnapshot(spark, out)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val viaDelta = DeltaInterop.importSnapshot(spark, out)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = (11L to 30L).map(i => (i, s"v$i")).toSet
    assert(viaIceberg == want, "removed file must not serve through Iceberg")
    assert(viaDelta == want, "the Delta log stays authoritative for Delta readers")
    // record counts in the manifest are footer-true
    val (_, recs) = readAvro(Files.list(Paths.get(out, "metadata"))
      .iterator().asScala.filter(_.getFileName.toString.endsWith("-m0.avro")).next())
    assert(recs.map(_.get("data_file").asInstanceOf[GenericRecord]
      .get("record_count").asInstanceOf[Long]).sum == 20L)
    // re-conversion refuses (metadata present)
    val eAgain = intercept[IllegalArgumentException](
      IcebergInterop.convertFromDelta(spark, out))
    assert(eAgain.getMessage.contains("already holds"))
    // DV'd table refuses: a converted snapshot would resurrect masked rows
    val outDv = tmp("d2i_dv_") + "/t"
    Files.createDirectories(Paths.get(outDv))
    val t2 = Files.createTempDirectory("d2i_dv_part_")
    df.coalesce(1).write.mode("overwrite").parquet(t2.toString)
    Files.move(Files.list(t2).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).next(),
      Paths.get(outDv, "a.parquet"))
    DeltaInterop.writeCommit(outDv, 0L, adds = Seq("a.parquet"),
      schemaJson = Some(df.schema.json))
    DeltaInterop.deleteWhere(spark, outDv, 1L, col("id") === 1L)
    val eDv = intercept[IllegalArgumentException](
      IcebergInterop.convertFromDelta(spark, outDv))
    assert(eDv.getMessage.contains("deletion vectors"))
  }

  test("convertFromDelta: identity-partitioned table converts, values ride the manifests, both bridges agree") {
    val out = tmp("d2i_p_") + "/t"
    Files.createDirectories(Paths.get(out))
    def onePart(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val t = Files.createTempDirectory("d2i_pp_")
      df.coalesce(1).write.mode("overwrite").parquet(t.toString)
      val part = Files.list(t).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).next()
      Files.move(part, Paths.get(out, name))
      ()
    }
    // the true Delta physical shape: data files LACK the partition column
    val df = Seq((1L, "x", "en"), (2L, "y", "en"), (3L, "z", "de"),
      (4L, "w", null)).toDF("id", "v", "lang")
    val schemaJson = df.schema.json
    Seq(("en", "p0.parquet"), ("de", "p1.parquet"), (null, "p2.parquet"))
      .foreach { case (l, n) =>
        onePart(df.filter(col("lang") <=> lit(l)).drop("lang"), n)
      }
    DeltaInterop.writeCommit(out, 0L,
      adds = Seq("p0.parquet", "p1.parquet", "p2.parquet"),
      schemaJson = Some(schemaJson), partitionColumns = Seq("lang"),
      partitionValues = Map(
        "p0.parquet" -> Map("lang" -> Some("en")),
        "p1.parquet" -> Map("lang" -> Some("de")),
        "p2.parquet" -> Map("lang" -> None)))
    val sizesBefore = Seq("p0", "p1", "p2")
      .map(n => Files.size(Paths.get(out, s"$n.parquet")))
    IcebergInterop.convertFromDelta(spark, out)
    assert(Seq("p0", "p1", "p2").map(n =>
      Files.size(Paths.get(out, s"$n.parquet"))) == sizesBefore,
      "metadata-only: zero data bytes move")
    def rows3(d: org.apache.spark.sql.DataFrame) = d
      .select(col("id"), col("v"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val want = Set((1L, "x", "en"), (2L, "y", "en"), (3L, "z", "de"),
      (4L, "w", null: String))
    assert(rows3(IcebergInterop.importSnapshot(spark, out)) == want,
      "identity values must serve from the manifest partition structs")
    assert(rows3(DeltaInterop.importSnapshot(spark, out)) == want,
      "the Delta log stays authoritative for Delta readers")
    // the written spec is a real identity spec over the source column
    val meta = new String(Files.readAllBytes(
      Paths.get(out, "metadata", "v1.metadata.json")), "UTF-8")
    assert(meta.contains("\"transform\":\"identity\"") ||
      meta.contains("\"transform\" : \"identity\""))
    // unsupported partition type refuses loudly (date → not silently NULL)
    val outD = tmp("d2i_pd_") + "/t"
    Files.createDirectories(Paths.get(outD))
    val dd = Seq((1L, java.sql.Date.valueOf("2024-01-01")))
      .toDF("id", "day")
    locally {
      val t = Files.createTempDirectory("d2i_pd_part_")
      dd.drop("day").coalesce(1).write.mode("overwrite").parquet(t.toString)
      val part = Files.list(t).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).next()
      Files.move(part, Paths.get(outD, "d0.parquet"))
    }
    DeltaInterop.writeCommit(outD, 0L, adds = Seq("d0.parquet"),
      schemaJson = Some(dd.schema.json), partitionColumns = Seq("day"),
      partitionValues = Map("d0.parquet" -> Map("day" -> Some("2024-01-01"))))
    val eT = intercept[IllegalArgumentException](
      IcebergInterop.convertFromDelta(spark, outD))
    assert(eT.getMessage.contains("string/int/long"))
  }

  test("non-identity transforms import when the files carry the source columns (bucket+truncate)") {
    val df = Seq((1L, "en", "x"), (2L, "de", "y"), (3L, "en", "z"),
      (4L, "fr", "w"), (5L, "de", "q")).toDF("id", "lang", "txt")
    val out = tmp("ice_xf_")
    IcebergFixtures.writeTransformPartitionedV1(spark, out, df, Seq(
      ("id_bucket", "bucket[4]", "id", pmod(col("id"), lit(4L)).cast("int")),
      ("lang_trunc", "truncate[1]", "lang", substring(col("lang"), 1, 1))))
    val got = IcebergInterop.importSnapshot(spark, out)
    assert(got.schema.fieldNames.toSeq == Seq("id", "lang", "txt"))
    assert(got.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet ==
      Set((1L, "en", "x"), (2L, "de", "y"), (3L, "en", "z"),
        (4L, "fr", "w"), (5L, "de", "q")))
  }

  test("days transform imports the same way (temporal source column read from files)") {
    val df = Seq((1L, 86400L * 3), (2L, 86400L * 3 + 7), (3L, 86400L * 9))
      .toDF("id", "secs")
      .select(col("id"), timestamp_seconds(col("secs")).as("ts"))
    val out = tmp("ice_days_")
    IcebergFixtures.writeTransformPartitionedV1(spark, out, df, Seq(
      ("ts_day", "days", "ts",
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("int"))))
    val got = IcebergInterop.importSnapshot(spark, out)
    assert(got.count() == 3 &&
      got.select(col("id")).collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
  }

  test("metadata-only migrated shape (files LACK the transform source) refuses naming the file") {
    val df = Seq((1L, "en"), (2L, "de")).toDF("id", "lang")
    val out = tmp("ice_xf_miss_")
    IcebergFixtures.writeTransformPartitionedV1(spark, out, df, Seq(
      ("id_bucket", "bucket[4]", "id", pmod(col("id"), lit(4L)).cast("int"))),
      omitSourceColumns = true)
    // prove the fixture files really lack the source column
    assert(!spark.read.parquet(Paths.get(out, "data").toString)
      .schema.fieldNames.contains("id"))
    val e = intercept[IllegalArgumentException](
      IcebergInterop.importSnapshot(spark, out).collect())
    assert(e.getMessage.contains("metadata-only migrated") &&
      e.getMessage.contains("bucket[4]") && e.getMessage.contains("p0.parquet"),
      e.getMessage)
  }

  test("mixed spec: identity field restores from the manifest while a bucket source reads from files") {
    val df = Seq((1L, "en", "x"), (2L, "de", "y"), (3L, "en", "z"))
      .toDF("id", "lang", "txt")
    val out = tmp("ice_xf_mixed_")
    IcebergFixtures.writeTransformPartitionedV1(spark, out, df, Seq(
      ("lang", "identity", "lang", col("lang")),
      ("id_bucket", "bucket[2]", "id", pmod(col("id"), lit(2L)).cast("int"))))
    val got = IcebergInterop.importSnapshot(spark, out)
    assert(got.schema.fieldNames.toSeq == Seq("id", "lang", "txt"))
    assert(got.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet ==
      Set((1L, "en", "x"), (2L, "de", "y"), (3L, "en", "z")))
  }

  test("a column rename in the schema history refuses (by-name read would serve NULLs)") {
    val table = tmp("ice_ren_") + "/t"
    VersionedTable.append(table)(dir =>
      Seq((1L, "a")).toDF("id", "v").coalesce(1).write.parquet(dir))
    val out = tmp("ice_ren_out_")
    IcebergInterop.exportSnapshot(spark, table, out)
    val metaFile = Paths.get(out, "metadata", "v1.metadata.json")
    val meta = mapper.readTree(Files.readAllBytes(metaFile))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    // rewrite as v2-style schema history: schema-id 0 = the original,
    // schema-id 1 renames field id 2 from "v" to "w"
    val s0 = meta.get("schema").deepCopy()
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val s1 = s0.deepCopy()
    s1.put("schema-id", 1)
    val renamed = s1.withArray("fields").elements()
    while (renamed.hasNext) {
      val f = renamed.next().asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      if (f.get("id").asInt() == 2) f.put("name", "w")
    }
    meta.putArray("schemas").add(s0).add(s1)
    meta.put("current-schema-id", 1)
    Files.write(metaFile, mapper.writeValueAsBytes(meta))
    val e = intercept[IllegalArgumentException](IcebergInterop.importSnapshot(spark, out))
    assert(e.getMessage.contains("renamed"), e.getMessage)
    // add-only evolution (a THIRD schema appending a fresh field id) is fine
    val meta2 = mapper.readTree(Files.readAllBytes(metaFile))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val arr = meta2.withArray("schemas")
    arr.removeAll()
    val s2 = s0.deepCopy(); s2.put("schema-id", 2)
    val nf = s2.withArray("fields").addObject()
    nf.put("id", 99); nf.put("name", "extra"); nf.put("required", false)
    nf.put("type", "long")
    arr.add(s0).add(s2)
    meta2.put("current-schema-id", 2)
    Files.write(metaFile, mapper.writeValueAsBytes(meta2))
    val got = IcebergInterop.importSnapshot(spark, out)
    assert(got.schema.fieldNames.toSeq == Seq("id", "v", "extra"))
    val r = got.collect().head
    assert(r.getLong(0) == 1L && r.getString(1) == "a" && r.isNullAt(2))
  }

  test("appendSnapshot: carried/removed/added files; asOfSnapshotId time-travels") {
    val table = tmp("ice_snap_") + "/t"
    VersionedTable.append(table)(dir =>
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1).write.parquet(dir))
    VersionedTable.append(table)(dir =>
      Seq((3L, "c")).toDF("id", "v").coalesce(1).write.parquet(dir))
    val out = tmp("ice_snap_out_")
    val rels = IcebergInterop.exportSnapshot(spark, table, out)
    val firstSnap = mapper.readTree(Files.readAllBytes(
      Paths.get(out, "metadata", "v1.metadata.json"))).get("current-snapshot-id").asLong()

    // snapshot 2: drop the file holding (3,c), add (4,d)+(5,e)
    val victim = rels.find { r =>
      spark.read.parquet(ref(out, r).toString)
        .filter(col("id") === 3L).count() > 0
    }.get
    val snap2 = IcebergInterop.appendSnapshot(spark, out,
      Seq((4L, "d"), (5L, "e")).toDF("id", "v").coalesce(1), removePaths = Seq(victim))

    // version hint advanced; current reads the new state
    assert(new String(Files.readAllBytes(
      Paths.get(out, "metadata", "version-hint.text")), "UTF-8").trim == "2")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows(IcebergInterop.importSnapshot(spark, out)) ==
      Set((1L, "a"), (2L, "b"), (4L, "d"), (5L, "e")))
    // the RETAINED first snapshot still serves the pre-rewrite state
    assert(rows(IcebergInterop.importSnapshot(spark, out,
      asOfSnapshotId = Some(firstSnap))) == Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(snap2 != firstSnap)
    // the new manifest carries the kept file as EXISTING (status 0)
    val meta2 = mapper.readTree(Files.readAllBytes(
      Paths.get(out, "metadata", "v2.metadata.json")))
    val ml2 = ref(out,
      meta2.get("snapshots").elements().asScala
        .find(_.get("snapshot-id").asLong() == snap2).get
        .get("manifest-list").asText())
    val (_, mlRows) = readAvro(ml2)
    assert(mlRows.head.get("existing_data_files_count") == 1)
    assert(mlRows.head.get("added_data_files_count") == 1)
    // schema mismatch refuses
    val e = intercept[IllegalArgumentException](IcebergInterop.appendSnapshot(
      spark, out, Seq((1L, 2L)).toDF("id", "n")))
    assert(e.getMessage.contains("schema"))
  }

  test("identity-partitioned v1 import: partition column restored from manifest metadata, NULL included") {
    // the Hive-migrated shape: data files DO NOT contain the partition
    // column — its only home is the manifest entry partition struct
    val df = Seq((1L, "a", "en"), (2L, "b", "en"), (3L, "c", "de"))
      .toDF("id", "v", "pl")
      .union(Seq((4L, "d")).toDF("id", "v").withColumn("pl", lit(null: String)))
    val out = tmp("ice_pfix_")
    IcebergFixtures.writePartitionedV1(spark, out, df, "pl")
    // prove the files really lack the column
    val raw = spark.read.parquet(Paths.get(out, "data").toString)
    assert(!raw.schema.fieldNames.contains("pl"), "fixture files must not carry pl")
    val got = IcebergInterop.importSnapshot(spark, out)
    assert(got.schema.fieldNames.toSeq == Seq("id", "v", "pl"))
    assert(got.schema("pl").dataType == org.apache.spark.sql.types.StringType)
    val rows = got.collect().map(r => (r.getLong(0), r.getString(1),
      Option(r.getString(2)).getOrElse("<null>"))).toSet
    assert(rows == Set((1L, "a", "en"), (2L, "b", "en"), (3L, "c", "de"),
      (4L, "d", "<null>")), s"partition values must restore: $rows")
  }

  test("v2 position deletes are applied: deleted rows absent, survivors intact") {
    val df = (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v")
    val out = tmp("ice_v2_")
    IcebergFixtures.writeV2WithDeletes(spark, out, df, "id", col("id") % 5 === 0)
    val got = IcebergInterop.importSnapshot(spark, out)
    val ids = got.collect().map(_.getLong(0)).toSet
    assert(ids == (1L to 20L).filter(_ % 5 != 0).toSet,
      s"rows named by the position-delete file must be absent: $ids")
    assert(got.schema.fieldNames.toSeq == Seq("id", "v"))
    // and the v column of a survivor adjacent to a deleted row is intact
    // (an off-by-one in pos handling would surface exactly here)
    val v4 = got.filter(col("id") === 4L).collect().head.getString(1)
    val v6 = got.filter(col("id") === 6L).collect().head.getString(1)
    assert(v4 == "v4" && v6 == "v6")
  }

  test("v2 equality deletes: applied with sequence gating; malformed (no equality_ids) refuses") {
    // sequence-observable history: file A (even ids, seq 1), equality
    // delete v='del' (seq 2), file B (odd ids, seq 3) — the delete must
    // remove A's matches only; B's matches were re-inserted later
    val df = (1L to 12L).map(i => (i, if (i % 3 == 0) "del" else s"v$i")).toDF("id", "v")
    val out = tmp("ice_v2eq_")
    IcebergFixtures.writeV2EqualityDeletes(spark, out, df, "id", "v", "del")
    val got = IcebergInterop.importSnapshot(spark, out)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = (1L to 12L).map(i => (i, if (i % 3 == 0) "del" else s"v$i"))
      .filterNot { case (i, v) => i % 2 == 0 && v == "del" }.toSet
    assert(got == want,
      s"seq-1 matches deleted, seq-3 matches survive: got $got")
    // a content=2 entry WITHOUT equality_ids is malformed — refuse by name
    val df2 = (1L to 6L).map(i => (i, s"v$i")).toDF("id", "v")
    val out2 = tmp("ice_v2eqbad_")
    IcebergFixtures.writeV2WithDeletes(spark, out2, df2, "id",
      col("id") === 1L, equalityInstead = true)
    val e = intercept[IllegalArgumentException](IcebergInterop.importSnapshot(spark, out2))
    assert(e.getMessage.contains("without equality_ids"))
  }

  test("deleteWhereEquality: engine-written content=2 file, blind key tuples, sequence-gated on read") {
    import spark.implicits._
    // fixture history: file A (even ids, seq 1), fixture eq-delete v='x'
    // (seq 2), file B (odd ids, seq 3) — so id 2 ('x', seq 1) is dead,
    // id 1 ('x', seq 3) is a post-delete re-insert and lives
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "y"), (5L, "z"),
      (6L, "z")).toDF("id", "v")
    val out = tmp("ice_eqdelw_")
    IcebergFixtures.writeV2EqualityDeletes(spark, out, df, "id", "v", "x")
    // the ENGINE's delete lands at seq 4 — ABOVE both data files, so
    // matches in A (seq 1) and B (seq 3) both die
    val n = IcebergInterop.deleteWhereEquality(spark, out,
      Seq("y", "y").toDF("v"), Seq("v")) // duplicate tuple dedupes
    assert(n == 1L, s"one distinct delete tuple, got $n")
    val got = IcebergInterop.importSnapshot(spark, out)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "x"), (5L, "z"), (6L, "z")),
      s"post-delete re-insert survives, both 'y' rows die: $got")
    // the written manifest carries the schema field id in equality_ids
    val eqMan = Files.list(java.nio.file.Paths.get(out, "metadata"))
      .iterator().asScala.filter(_.getFileName.toString.startsWith("eqdelw-"))
      .toSeq
    assert(eqMan.size == 1)
    val (_, recs) = readAvro(eqMan.head)
    val dfr = recs.head.get("data_file").asInstanceOf[GenericRecord]
    assert(dfr.get("content").asInstanceOf[Int] == 2)
    assert(dfr.get("equality_ids").asInstanceOf[java.util.Collection[_]]
      .asScala.toSeq == Seq(2)) // 'v' is schema field id 2
    // empty delete set is a no-op (no snapshot appended)
    val hint0 = new String(Files.readAllBytes(
      java.nio.file.Paths.get(out, "metadata", "version-hint.text")), "UTF-8")
    assert(IcebergInterop.deleteWhereEquality(spark, out,
      spark.emptyDataFrame.select(lit("q").as("v")).filter(lit(false)),
      Seq("v")) == 0L)
    assert(new String(Files.readAllBytes(java.nio.file.Paths.get(
      out, "metadata", "version-hint.text")), "UTF-8") == hint0)
    // unknown equality column refuses by name
    val e = intercept[IllegalArgumentException](
      IcebergInterop.deleteWhereEquality(spark, out,
        Seq("a").toDF("nope"), Seq("nope")))
    assert(e.getMessage.contains("'nope'"))
    // column-set mismatch refuses
    val e2 = intercept[IllegalArgumentException](
      IcebergInterop.deleteWhereEquality(spark, out,
        Seq(("a", 1L)).toDF("v", "id"), Seq("v")))
    assert(e2.getMessage.contains("exactly the equality columns"))
  }

  test("deleteWhere: v2 delete snapshot — idempotent, time-travelable, v1 refuses") {
    val out = tmp("ice_delw_")
    val df = (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v")
    IcebergFixtures.writeV2WithDeletes(spark, out, df, "id",
      col("id") % 10 === 1) // wave 1: 10 rows via fixture deletes
    val meta0 = mapper.readTree(Files.readAllBytes(
      java.nio.file.Paths.get(out, "metadata", "v2.metadata.json")))
    val snap0 = meta0.get("current-snapshot-id").asLong()

    val n = IcebergInterop.deleteWhere(spark, out, col("id") % 10 === 2)
    assert(n == 10L, s"wave 2 must delete 10 fresh rows, got $n")
    val got = IcebergInterop.importSnapshot(spark, out)
      .select("id").as[Long].collect().toSet
    assert(got == (0L until 100L).filter(i => i % 10 != 1 && i % 10 != 2).toSet)

    // idempotence: the same predicate again deletes NOTHING new (and a
    // predicate overlapping wave 1 only counts the fresh rows)
    assert(IcebergInterop.deleteWhere(spark, out, col("id") % 10 === 2) == 0L)
    val overlap = IcebergInterop.deleteWhere(spark, out, col("id") % 5 === 1)
    assert(overlap == 10L, // %5==1 hits %10==1 (dead) and %10==6 (alive)
      s"overlap wave must re-delete only the live half, got $overlap")

    // time travel: the pre-delete snapshot still serves every row
    val before = IcebergInterop.importSnapshot(spark, out,
      asOfSnapshotId = Some(snap0))
      .select("id").as[Long].collect().toSet
    assert(before == (0L until 100L).filter(_ % 10 != 1).toSet,
      "asOf the fixture snapshot: only wave-1 deletes apply")

    // v1 tables refuse (no sequence numbers)
    val v1t = tmp("ice_delw_v1_") + "/t"
    VersionedTable.append(v1t)(d =>
      Seq((1L, "a")).toDF("id", "v").coalesce(1).write.parquet(d))
    val v1out = tmp("ice_delw_v1o_")
    IcebergInterop.exportSnapshot(spark, v1t, v1out)
    val e = intercept[IllegalArgumentException] {
      IcebergInterop.deleteWhere(spark, v1out, col("id") === 1L)
    }
    assert(e.getMessage.contains("format-v1"))
  }

  test("appendSnapshot refuses format-v2 tables") {
    val df = (1L to 4L).map(i => (i, s"v$i")).toDF("id", "v")
    val out = tmp("ice_v2app_")
    IcebergFixtures.writeV2WithDeletes(spark, out, df, "id", col("id") === 1L)
    val e = intercept[IllegalArgumentException](IcebergInterop.appendSnapshot(
      spark, out, Seq((9L, "x")).toDF("id", "v")))
    assert(e.getMessage.contains("format-v"))
  }

  test("refuses to clobber existing metadata; unsupported types refuse on export") {
    val table = tmp("ice_ref_") + "/t"
    VersionedTable.append(table)(dir =>
      Seq((1L, "a")).toDF("id", "v").coalesce(1).write.parquet(dir))
    val out = tmp("ice_ref_out_")
    IcebergInterop.exportSnapshot(spark, table, out)
    intercept[IllegalArgumentException](IcebergInterop.exportSnapshot(spark, table, out))
    // a map column has no mapping in this bridge's declared subset
    val mapTable = tmp("ice_map_") + "/t"
    VersionedTable.append(mapTable)(dir =>
      Seq((1L, Map("k" -> 1L))).toDF("id", "m").coalesce(1).write.parquet(dir))
    val out2 = tmp("ice_map_out_")
    val e = intercept[IllegalArgumentException](
      IcebergInterop.exportSnapshot(spark, mapTable, out2))
    assert(e.getMessage.contains("no Iceberg mapping"))
  }

  test("expireSnapshots: history gone, current serves, expired-only data files reclaimed") {
    val table = tmp("ice_exp_") + "/t"
    VersionedTable.append(table)(dir =>
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1).write.parquet(dir))
    VersionedTable.append(table)(dir =>
      Seq((3L, "c")).toDF("id", "v").coalesce(1).write.parquet(dir))
    val out = tmp("ice_exp_out_")
    val rels = IcebergInterop.exportSnapshot(spark, table, out)
    val firstSnap = mapper.readTree(Files.readAllBytes(
      Paths.get(out, "metadata", "v1.metadata.json"))).get("current-snapshot-id").asLong()
    // snapshot 2 drops the (3,c) file — that file is then referenced ONLY
    // by snapshot 1 and must be physically reclaimed by its expiration
    val victim = rels.find { r =>
      spark.read.parquet(ref(out, r).toString).filter(col("id") === 3L).count() > 0
    }.get
    IcebergInterop.appendSnapshot(spark, out,
      Seq((4L, "d")).toDF("id", "v").coalesce(1), removePaths = Seq(victim))
    val victimPath = ref(out, victim)
    assert(Files.exists(victimPath))

    val rep = IcebergInterop.expireSnapshots(out, keepLast = 1)
    assert(rep.expiredSnapshotIds == Seq(firstSnap))
    assert(rep.deletedManifestLists.nonEmpty)
    assert(rep.deletedDataFiles.exists(_.endsWith(victimPath.getFileName.toString)),
      s"expired-only file not reclaimed: ${rep.deletedDataFiles}")
    assert(!Files.exists(victimPath))
    // current snapshot serves unchanged
    val rows = IcebergInterop.importSnapshot(spark, out)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "a"), (2L, "b"), (4L, "d")))
    // time travel to the expired snapshot refuses by name
    val e = intercept[IllegalArgumentException](
      IcebergInterop.importSnapshot(spark, out, asOfSnapshotId = Some(firstSnap)))
    assert(e.getMessage.contains("not in the snapshots list"))
    // expiring again is a no-op
    assert(IcebergInterop.expireSnapshots(out, keepLast = 1).expiredSnapshotIds.isEmpty)
  }

  test("expireSnapshots keeps shared data files; removeOrphanFiles only reclaims debris") {
    val table = tmp("ice_orph_") + "/t"
    VersionedTable.append(table)(dir =>
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1).write.parquet(dir))
    val out = tmp("ice_orph_out_")
    IcebergInterop.exportSnapshot(spark, table, out)
    // snapshot 2 ADDS a file; snapshot 1's file stays shared (EXISTING)
    IcebergInterop.appendSnapshot(spark, out,
      Seq((3L, "c")).toDF("id", "v").coalesce(1))
    val orphan = Paths.get(out, "data", "zz-debris.parquet")
    Files.write(orphan, Array[Byte](1, 2, 3))
    val rep = IcebergInterop.expireSnapshots(out, keepLast = 1)
    assert(rep.deletedDataFiles.isEmpty, s"shared files reclaimed: ${rep.deletedDataFiles}")
    val gone = IcebergInterop.removeOrphanFiles(out)
    assert(gone.exists(_.endsWith("zz-debris.parquet")) && !Files.exists(orphan))
    assert(IcebergInterop.importSnapshot(spark, out).count() == 3)
    // keepLast beyond history is a no-op
    assert(IcebergInterop.expireSnapshots(out, keepLast = 10).expiredSnapshotIds.isEmpty)
  }

  test("timestamp time travel resolves through the snapshot-log; pre-history refuses") {
    val table = tmp("ice_ts_") + "/t"
    VersionedTable.append(table)(dir =>
      Seq((1L, "a")).toDF("id", "v").coalesce(1).write.parquet(dir))
    val out = tmp("ice_ts_out_")
    IcebergInterop.exportSnapshot(spark, table, out)
    // exportSnapshot writes an empty snapshot-log (fixture-era layout);
    // appendSnapshot logs its commit — resolve between the two commits
    IcebergInterop.appendSnapshot(spark, out,
      Seq((2L, "b")).toDF("id", "v").coalesce(1))
    val meta = mapper.readTree(Files.readAllBytes(Paths.get(out, "metadata",
      s"v${new String(Files.readAllBytes(Paths.get(out, "metadata", "version-hint.text")), "UTF-8").trim}.metadata.json")))
    val logEntries = meta.get("snapshot-log").elements().asScala.toSeq
    val t2 = logEntries.map(_.get("timestamp-ms").asLong()).max
    val rows = IcebergInterop.importSnapshot(spark, out, asOfTimestampMs = Some(t2))
      .collect().map(_.getLong(0)).toSet
    assert(rows == Set(1L, 2L))
    val e = intercept[IllegalArgumentException](
      IcebergInterop.importSnapshot(spark, out, asOfTimestampMs = Some(0L)))
    assert(e.getMessage.contains("no snapshot at or before"))
    intercept[IllegalArgumentException](IcebergInterop.importSnapshot(
      spark, out, asOfSnapshotId = Some(1L), asOfTimestampMs = Some(t2)))
  }
}
