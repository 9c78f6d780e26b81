package graft.storage

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Synthesizers for EXTERNAL Iceberg table layouts this sandbox cannot
  * otherwise produce: the offline container has no Iceberg runtime, so
  * interop against "a table some other engine wrote" is exercised by
  * emitting the byte format straight from the published spec
  * (iceberg.apache.org/spec) — the same rationale as
  * [[IcebergInterop]]'s export, extended to the two shapes the bridge's
  * own exporter deliberately never writes:
  *
  *  - an IDENTITY-partitioned v1 table whose data files DO NOT contain
  *    the partition column (the Hive-migrated `add_files` shape — the
  *    value exists only in each manifest entry's partition struct), and
  *  - a format-v2 table with a POSITION-DELETE manifest (manifest-list
  *    `content=1`, `data_file.content=1`, the spec's `(file_path, pos)`
  *    delete parquet) — optionally a MALFORMED equality-delete entry
  *    (`content=2` without `equality_ids`) for the refusal arm, and
  *  - a format-v2 table with a well-formed EQUALITY-delete manifest in a
  *    sequence-observable history (data at seq 1 and 3, the delete at
  *    seq 2 — [[writeV2EqualityDeletes]]).
  *
  * Used by q145/q146/q152 and IcebergInteropSpec; all paths are the
  * spec-mandated full `file://` URIs.
  */
object IcebergFixtures {

  import IcebergInterop.{fld, mapper, writeAvro, icebergSchemaJson, manifestFileSchema}

  private[storage] def partitionStruct(fields: Seq[(String, Schema, Int)]): Schema = {
    val s = Schema.createRecord("r102", null, "iceberg", false)
    s.setFields(fields.map { case (n, t, id) => fld(n, id, t, optional = true) }.asJava)
    s
  }

  /** manifest_entry whose data_file carries the given partition struct;
    * `v2` adds the v2 fields (entry sequence numbers, data_file.content).
    */
  private[storage] def entrySchema(partition: Schema, v2: Boolean): Schema = {
    val dfFields = scala.collection.mutable.ArrayBuffer[Schema.Field]()
    if (v2) dfFields += fld("content", 134, Schema.create(Schema.Type.INT), optional = false)
    dfFields += fld("file_path", 100, Schema.create(Schema.Type.STRING), optional = false)
    dfFields += fld("file_format", 101, Schema.create(Schema.Type.STRING), optional = false)
    dfFields += { val f = new Schema.Field("partition", partition, null, null); f.addProp("field-id", 102); f }
    dfFields += fld("record_count", 103, Schema.create(Schema.Type.LONG), optional = false)
    dfFields += fld("file_size_in_bytes", 104, Schema.create(Schema.Type.LONG), optional = false)
    if (v2) dfFields += fld("equality_ids", 135,
      Schema.createArray(Schema.create(Schema.Type.INT)), optional = true)
    if (!v2) dfFields += fld("block_size_in_bytes", 105, Schema.create(Schema.Type.LONG), optional = false)
    val dataFile = Schema.createRecord("r2", null, "iceberg", false)
    dataFile.setFields(dfFields.asJava)
    val eFields = scala.collection.mutable.ArrayBuffer[Schema.Field](
      fld("status", 0, Schema.create(Schema.Type.INT), optional = false),
      fld("snapshot_id", 1, Schema.create(Schema.Type.LONG), optional = true))
    if (v2) {
      eFields += fld("sequence_number", 3, Schema.create(Schema.Type.LONG), optional = true)
      eFields += fld("file_sequence_number", 4, Schema.create(Schema.Type.LONG), optional = true)
    }
    eFields += { val f = new Schema.Field("data_file", dataFile, null, null); f.addProp("field-id", 2); f }
    val s = Schema.createRecord("manifest_entry", null, "iceberg", false)
    s.setFields(eFields.asJava)
    s
  }

  /** manifest_file with the v2-only routing fields (content 517,
    * sequence numbers 515/516 — spec "Manifest Lists").
    */
  private[storage] val manifestFileSchemaV2: Schema = {
    val s = Schema.createRecord("manifest_file", null, "iceberg", false)
    s.setFields(java.util.List.of(
      fld("manifest_path", 500, Schema.create(Schema.Type.STRING), optional = false),
      fld("manifest_length", 501, Schema.create(Schema.Type.LONG), optional = false),
      fld("partition_spec_id", 502, Schema.create(Schema.Type.INT), optional = false),
      fld("content", 517, Schema.create(Schema.Type.INT), optional = false),
      fld("sequence_number", 515, Schema.create(Schema.Type.LONG), optional = false),
      fld("min_sequence_number", 516, Schema.create(Schema.Type.LONG), optional = false),
      fld("added_snapshot_id", 503, Schema.create(Schema.Type.LONG), optional = true),
      fld("added_data_files_count", 504, Schema.create(Schema.Type.INT), optional = true),
      fld("existing_data_files_count", 505, Schema.create(Schema.Type.INT), optional = true),
      fld("deleted_data_files_count", 506, Schema.create(Schema.Type.INT), optional = true)))
    s
  }

  private[storage] def avroTypeFor(dt: DataType): Schema = dt match {
    case StringType  => Schema.create(Schema.Type.STRING)
    case LongType    => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case other => throw new IllegalArgumentException(
      s"fixture partition type $other not supported")
  }

  private def moveSinglePart(tmp: Path, dst: Path): Path = {
    val parts = Files.list(tmp).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    require(parts.size == 1, s"expected one part file in $tmp, got ${parts.size}")
    Files.createDirectories(dst.getParent)
    Files.move(parts.head, dst, StandardCopyOption.REPLACE_EXISTING)
    dst
  }

  /** An identity-partitioned v1 table: one data file per distinct value
    * of `partCol` (NULL included) holding every OTHER column — the
    * partition value lives only in the manifest partition struct, as a
    * Hive-migrated table's files do. Returns the partition values in
    * data-file order.
    */
  def writePartitionedV1(
      spark: SparkSession, outDir: String, df: DataFrame, partCol: String): Seq[Any] = {
    val out = Paths.get(outDir)
    require(!Files.exists(out.resolve("metadata")),
      s"$outDir already holds Iceberg metadata — refusing to overwrite")
    val schema = df.schema
    val partIdx = schema.fieldIndex(partCol)
    val partType = schema(partIdx).dataType
    val (schemaJson, lastColumnId) = icebergSchemaJson(schema)

    // one pass for the distinct values + their row counts
    val groups: Seq[(Any, Long)] = df.groupBy(col(partCol)).count().collect()
      .map(r => (r.get(0), r.getLong(1))).toSeq
      .sortBy { case (v, _) => if (v == null) "" else v.toString }

    val dataDir = out.resolve("data")
    Files.createDirectories(dataDir)
    val files: Seq[(Path, Any, Long)] = groups.zipWithIndex.map { case ((v, n), i) =>
      val slice = df.filter(col(partCol) <=> lit(v)).drop(partCol).repartition(1)
      val tmp = Files.createTempDirectory("graft_ice_fix_")
      slice.write.mode("overwrite").parquet(tmp.toString)
      (moveSinglePart(tmp, dataDir.resolve(s"p$i.parquet")), v, n)
    }

    val pStruct = partitionStruct(Seq((partCol, avroTypeFor(partType), 1000)))
    val withParts = files.map { case (f, v, n) =>
      val part = new GenericData.Record(pStruct)
      part.put(partCol, v)
      (f, part, n)
    }
    val specJson = s"""[{"name":"$partCol","transform":"identity","source-id":${partIdx + 1},"field-id":1000}]"""
    writeV1Meta(out, schemaJson, lastColumnId, specJson, pStruct,
      withParts, lastPartitionId = 1000)
    files.map(_._2)
  }

  /** A v1 table partitioned by NON-IDENTITY transforms, the normal
    * engine-written layout (spec "Partition Transforms"): every data file
    * CONTAINS the transform SOURCE columns (only metadata-only `add_files`
    * migrations omit them), and the manifest partition struct carries the
    * transformed values. `truncate[L]` / `days` values are computed per
    * the spec; `bucket[N]` values use a stand-in assignment (`src mod N`
    * instead of murmur3_32) — legal for reader-side tests because
    * non-identity values are OPAQUE to a reader (non-invertible is the
    * very property that forces the source-column read path), and this
    * fixture's reader never prunes by them. With `omitSourceColumns` the
    * data files DROP the source columns — the migrated shape
    * [[IcebergInterop.importSnapshot]] must refuse.
    *
    * @param fields (partitionFieldName, transformString, sourceColName,
    *               valueExpr) — one data file per distinct value tuple
    */
  def writeTransformPartitionedV1(
      spark: SparkSession, outDir: String, df: DataFrame,
      fields: Seq[(String, String, String, Column)],
      omitSourceColumns: Boolean = false): Unit = {
    val out = Paths.get(outDir)
    require(!Files.exists(out.resolve("metadata")),
      s"$outDir already holds Iceberg metadata — refusing to overwrite")
    require(fields.nonEmpty, "need at least one transform field")
    val schema = df.schema
    val (schemaJson, lastColumnId) = icebergSchemaJson(schema)
    val pvNames = fields.map { case (n, _, _, _) => s"__pv_$n" }
    val tagged = df.select((schema.fieldNames.map(col) ++
      fields.zip(pvNames).map { case ((_, _, _, v), pn) => v.as(pn) }).toIndexedSeq: _*)
    val pvTypes = pvNames.map(pn => tagged.schema(pn).dataType)
    val groups: Seq[Seq[Any]] = tagged.select(pvNames.map(col): _*).distinct()
      .collect().map(_.toSeq).toSeq
      .sortBy(_.map(v => if (v == null) "" else v.toString).mkString(" "))
    val dropCols = if (omitSourceColumns) fields.map(_._3).distinct else Nil
    val dataDir = out.resolve("data")
    Files.createDirectories(dataDir)
    val pStruct = partitionStruct(fields.map(_._1).zip(pvTypes).zipWithIndex.map {
      case ((n, dt), i) => (n, avroTypeFor(dt), 1000 + i) })
    val files: Seq[(Path, GenericRecord, Long)] = groups.zipWithIndex.map {
      case (vs, i) =>
        val cond = pvNames.zip(vs).map { case (pn, v) => col(pn) <=> lit(v) }
          .reduce(_ && _)
        val slice = tagged.filter(cond).drop(pvNames: _*).drop(dropCols: _*)
          .repartition(1)
        val tmp = Files.createTempDirectory("graft_ice_xf_")
        slice.write.mode("overwrite").parquet(tmp.toString)
        val f = moveSinglePart(tmp, dataDir.resolve(s"p$i.parquet"))
        val part = new GenericData.Record(pStruct)
        fields.map(_._1).zip(vs).foreach { case (n, v) => part.put(n, v) }
        val n = tagged.filter(cond).count()
        (f, part, n)
    }
    val specJson = fields.zipWithIndex.map { case ((n, t, src, _), i) =>
      s"""{"name":"$n","transform":"$t","source-id":${schema.fieldIndex(src) + 1},"field-id":${1000 + i}}"""
    }.mkString("[", ",", "]")
    writeV1Meta(out, schemaJson, lastColumnId, specJson, pStruct, files,
      lastPartitionId = 1000 + fields.size - 1)
  }

  /** Shared v1 metadata tail: one manifest over `files` (path, partition
    * record, row count), a one-manifest list, and the v1.metadata.json +
    * version hint — spec "Table Metadata".
    */
  private def writeV1Meta(out: Path, schemaJson: String, lastColumnId: Int,
      specJson: String, pStruct: Schema,
      files: Seq[(Path, GenericRecord, Long)], lastPartitionId: Int): Unit = {
    val metaDir = out.resolve("metadata")
    Files.createDirectories(metaDir)
    val snapshotId = 4242L
    val eSchema = entrySchema(pStruct, v2 = false)
    val entries = files.map { case (f, part, n) =>
      val dfr = new GenericData.Record(eSchema.getField("data_file").schema())
      dfr.put("file_path", f.toUri.toString)
      dfr.put("file_format", "PARQUET")
      dfr.put("partition", part)
      dfr.put("record_count", n)
      dfr.put("file_size_in_bytes", Files.size(f))
      dfr.put("block_size_in_bytes", 64L * 1024 * 1024)
      val e = new GenericData.Record(eSchema)
      e.put("status", 1)
      e.put("snapshot_id", snapshotId)
      e.put("data_file", dfr)
      e
    }
    val manifestPath = metaDir.resolve("fixture-m0.avro")
    writeAvro(manifestPath, eSchema, entries, Map(
      "schema" -> schemaJson, "partition-spec" -> specJson,
      "partition-spec-id" -> "0", "format-version" -> "1"))
    val mf = new GenericData.Record(manifestFileSchema)
    mf.put("manifest_path", manifestPath.toUri.toString)
    mf.put("manifest_length", Files.size(manifestPath))
    mf.put("partition_spec_id", 0)
    mf.put("added_snapshot_id", snapshotId)
    mf.put("added_data_files_count", files.size)
    mf.put("existing_data_files_count", 0)
    mf.put("deleted_data_files_count", 0)
    mf.put("added_rows_count", files.map(_._3).sum)
    mf.put("existing_rows_count", 0L)
    mf.put("deleted_rows_count", 0L)
    val manifestListPath = metaDir.resolve(s"snap-$snapshotId-1-fixture.avro")
    writeAvro(manifestListPath, manifestFileSchema, Seq(mf), Map("format-version" -> "1"))

    val root = mapper.createObjectNode()
    root.put("format-version", 1)
    root.put("table-uuid", java.util.UUID.randomUUID().toString)
    root.put("location", out.toString)
    root.put("last-updated-ms", 0L)
    root.put("last-column-id", lastColumnId)
    root.set[com.fasterxml.jackson.databind.JsonNode]("schema", mapper.readTree(schemaJson))
    val specs = root.putArray("partition-specs")
    val spec0 = specs.addObject()
    spec0.put("spec-id", 0)
    spec0.set[com.fasterxml.jackson.databind.JsonNode]("fields", mapper.readTree(specJson))
    root.put("default-spec-id", 0)
    root.put("last-partition-id", lastPartitionId)
    root.putObject("properties")
    root.put("current-snapshot-id", snapshotId)
    val snaps = root.putArray("snapshots")
    val snap = snaps.addObject()
    snap.put("snapshot-id", snapshotId)
    snap.put("timestamp-ms", 0L)
    snap.putObject("summary").put("operation", "append")
    snap.put("manifest-list", manifestListPath.toUri.toString)
    root.putArray("snapshot-log")
    root.putArray("metadata-log")
    Files.write(metaDir.resolve("v1.metadata.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    Files.write(metaDir.resolve("version-hint.text"), "1".getBytes("UTF-8"))
    ()
  }

  /** A format-v2 table: `df` split into two data files by
    * `orderCol % 2`, each written in `orderCol` order (so row position
    * is the `orderCol` rank within its slice), plus ONE delete manifest.
    * With `equalityInstead = false` the delete manifest carries a real
    * position-delete parquet — the spec's `(file_path, pos)` columns —
    * deleting every row matching `deleteCond`; with `true` it declares
    * the same file as an EQUALITY delete (`data_file.content=2`) WITHOUT
    * `equality_ids` — a malformed layout [[IcebergInterop.importSnapshot]]
    * must refuse by name (well-formed equality deletes are applied; see
    * [[writeV2EqualityDeletes]]).
    */
  /** A format-v2 table whose history makes SEQUENCE ordering observable:
    * data file A (`orderCol % 2 = 0` rows) lands at sequence 1, an
    * EQUALITY delete file (one tuple: `eqCol = deletedValue`,
    * `equality_ids` naming `eqCol`) at sequence 2, data file B (odd
    * rows) at sequence 3. A correct reader deletes the matching rows of
    * file A only — file B's matches were (re-)inserted AFTER the delete
    * and must survive (the Flink-CDC upsert shape). An
    * ignore-the-sequence reader over-deletes; an ignore-the-delete
    * reader resurrects: both break the q152 hash.
    */
  def writeV2EqualityDeletes(
      spark: SparkSession, outDir: String, df: DataFrame, orderCol: String,
      eqCol: String, deletedValue: String): Unit = {
    val out = Paths.get(outDir)
    require(!Files.exists(out.resolve("metadata")),
      s"$outDir already holds Iceberg metadata — refusing to overwrite")
    val (schemaJson, lastColumnId) = icebergSchemaJson(df.schema)
    val eqFieldId = df.schema.fieldIndex(eqCol) + 1 // top-level ids are 1..n
    val dataDir = out.resolve("data")
    Files.createDirectories(dataDir)

    val slices: Seq[(Path, Long, Long)] = Seq((0, 1L), (1, 3L)).map { case (par, seq) =>
      val slice = df.filter(pmod(col(orderCol), lit(2)) === par)
        .repartition(1).sortWithinPartitions(orderCol)
      val tmp = Files.createTempDirectory("graft_ice_v2e_")
      slice.write.mode("overwrite").parquet(tmp.toString)
      (moveSinglePart(tmp, dataDir.resolve(s"d$par.parquet")), slice.count(), seq)
    }
    val delTmp = Files.createTempDirectory("graft_ice_v2edel_")
    val delFile = { // one-tuple equality delete parquet: just the eqCol column
      import spark.implicits._
      Seq(deletedValue).toDF(eqCol).repartition(1)
        .write.mode("overwrite").parquet(delTmp.toString)
      moveSinglePart(delTmp, dataDir.resolve("eqdel0.parquet"))
    }

    val metaDir = out.resolve("metadata")
    Files.createDirectories(metaDir)
    val snapshotId = 9393L
    val pStruct = partitionStruct(Nil)
    val eSchema = entrySchema(pStruct, v2 = true)
    def entry(f: Path, n: Long, content: Int, seq: Long,
        eqIds: Seq[Int]): GenericRecord = {
      val dfr = new GenericData.Record(eSchema.getField("data_file").schema())
      dfr.put("content", content)
      dfr.put("file_path", f.toUri.toString)
      dfr.put("file_format", "PARQUET")
      dfr.put("partition", new GenericData.Record(pStruct))
      dfr.put("record_count", n)
      dfr.put("file_size_in_bytes", Files.size(f))
      if (eqIds.nonEmpty)
        dfr.put("equality_ids", eqIds.map(Integer.valueOf).asJava)
      val e = new GenericData.Record(eSchema)
      e.put("status", 1)
      e.put("snapshot_id", snapshotId)
      e.put("sequence_number", seq)
      e.put("file_sequence_number", seq)
      e.put("data_file", dfr)
      e
    }
    val dataManifest = metaDir.resolve("fixture-m0.avro")
    writeAvro(dataManifest, eSchema,
      slices.map { case (f, n, seq) => entry(f, n, 0, seq, Nil) },
      Map("schema" -> schemaJson, "partition-spec" -> "[]",
        "partition-spec-id" -> "0", "format-version" -> "2", "content" -> "data"))
    val delManifest = metaDir.resolve("fixture-m1.avro")
    writeAvro(delManifest, eSchema,
      Seq(entry(delFile, 1L, 2, 2L, Seq(eqFieldId))),
      Map("schema" -> schemaJson, "partition-spec" -> "[]",
        "partition-spec-id" -> "0", "format-version" -> "2", "content" -> "deletes"))
    def mfRec(p: Path, content: Int, seq: Long, nFiles: Int): GenericRecord = {
      val mf = new GenericData.Record(manifestFileSchemaV2)
      mf.put("manifest_path", p.toUri.toString)
      mf.put("manifest_length", Files.size(p))
      mf.put("partition_spec_id", 0)
      mf.put("content", content)
      mf.put("sequence_number", seq)
      mf.put("min_sequence_number", 1L)
      mf.put("added_snapshot_id", snapshotId)
      mf.put("added_data_files_count", nFiles)
      mf.put("existing_data_files_count", 0)
      mf.put("deleted_data_files_count", 0)
      mf
    }
    val manifestListPath = metaDir.resolve(s"snap-$snapshotId-1-fixture.avro")
    writeAvro(manifestListPath, manifestFileSchemaV2,
      Seq(mfRec(dataManifest, 0, 3L, slices.size), mfRec(delManifest, 1, 2L, 1)),
      Map("format-version" -> "2"))

    val root = mapper.createObjectNode()
    root.put("format-version", 2)
    root.put("table-uuid", java.util.UUID.randomUUID().toString)
    root.put("location", out.toString)
    root.put("last-sequence-number", 3L)
    root.put("last-updated-ms", 0L)
    root.put("last-column-id", lastColumnId)
    val schemas = root.putArray("schemas")
    schemas.add(mapper.readTree(schemaJson))
    root.put("current-schema-id", 0)
    val specs = root.putArray("partition-specs")
    val spec0 = specs.addObject()
    spec0.put("spec-id", 0)
    spec0.putArray("fields")
    root.put("default-spec-id", 0)
    root.put("last-partition-id", 999)
    root.putObject("properties")
    root.put("current-snapshot-id", snapshotId)
    val snaps = root.putArray("snapshots")
    val snap = snaps.addObject()
    snap.put("snapshot-id", snapshotId)
    snap.put("sequence-number", 3L)
    snap.put("timestamp-ms", 0L)
    snap.putObject("summary").put("operation", "overwrite")
    snap.put("manifest-list", manifestListPath.toUri.toString)
    root.putArray("snapshot-log")
    root.putArray("metadata-log")
    Files.write(metaDir.resolve("v2.metadata.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    Files.write(metaDir.resolve("version-hint.text"), "2".getBytes("UTF-8"))
  }

  def writeV2WithDeletes(
      spark: SparkSession, outDir: String, df: DataFrame, orderCol: String,
      deleteCond: Column, equalityInstead: Boolean = false): Unit = {
    val out = Paths.get(outDir)
    require(!Files.exists(out.resolve("metadata")),
      s"$outDir already holds Iceberg metadata — refusing to overwrite")
    val (schemaJson, lastColumnId) = icebergSchemaJson(df.schema)
    val dataDir = out.resolve("data")
    Files.createDirectories(dataDir)

    val slices: Seq[(Path, Long)] = (0 to 1).map { i =>
      val slice = df.filter(pmod(col(orderCol), lit(2)) === i)
        .repartition(1).sortWithinPartitions(orderCol)
      val tmp = Files.createTempDirectory("graft_ice_v2_")
      slice.write.mode("overwrite").parquet(tmp.toString)
      val n = slice.count()
      (moveSinglePart(tmp, dataDir.resolve(s"d$i.parquet")), n)
    }

    // position deletes: pos = rank of the row within its slice file
    val w = Window.partitionBy(col("__slice")).orderBy(col(orderCol))
    val delDf = df.withColumn("__slice", pmod(col(orderCol), lit(2)))
      .withColumn("pos", row_number().over(w).cast("long") - 1)
      .filter(deleteCond)
      .select(
        when(col("__slice") === 0, lit(slices(0)._1.toUri.toString))
          .otherwise(lit(slices(1)._1.toUri.toString)).as("file_path"),
        col("pos"))
    val nDel = delDf.count()
    val delTmp = Files.createTempDirectory("graft_ice_del_")
    delDf.repartition(1).write.mode("overwrite").parquet(delTmp.toString)
    val delFile = moveSinglePart(delTmp, dataDir.resolve("del0.parquet"))

    val metaDir = out.resolve("metadata")
    Files.createDirectories(metaDir)
    val snapshotId = 8484L
    val pStruct = partitionStruct(Nil)
    val eSchema = entrySchema(pStruct, v2 = true)
    def entry(f: Path, n: Long, content: Int, seq: Long): GenericRecord = {
      val dfr = new GenericData.Record(eSchema.getField("data_file").schema())
      dfr.put("content", content)
      dfr.put("file_path", f.toUri.toString)
      dfr.put("file_format", "PARQUET")
      dfr.put("partition", new GenericData.Record(pStruct))
      dfr.put("record_count", n)
      dfr.put("file_size_in_bytes", Files.size(f))
      val e = new GenericData.Record(eSchema)
      e.put("status", 1)
      e.put("snapshot_id", snapshotId)
      e.put("sequence_number", seq)
      e.put("file_sequence_number", seq)
      e.put("data_file", dfr)
      e
    }
    val dataManifest = metaDir.resolve("fixture-m0.avro")
    writeAvro(dataManifest, eSchema,
      slices.map { case (f, n) => entry(f, n, 0, 1L) },
      Map("schema" -> schemaJson, "partition-spec" -> "[]",
        "partition-spec-id" -> "0", "format-version" -> "2", "content" -> "data"))
    val delManifest = metaDir.resolve("fixture-m1.avro")
    writeAvro(delManifest, eSchema,
      Seq(entry(delFile, nDel, if (equalityInstead) 2 else 1, 2L)),
      Map("schema" -> schemaJson, "partition-spec" -> "[]",
        "partition-spec-id" -> "0", "format-version" -> "2", "content" -> "deletes"))

    def mfRec(p: Path, content: Int, seq: Long, nFiles: Int): GenericRecord = {
      val mf = new GenericData.Record(manifestFileSchemaV2)
      mf.put("manifest_path", p.toUri.toString)
      mf.put("manifest_length", Files.size(p))
      mf.put("partition_spec_id", 0)
      mf.put("content", content)
      mf.put("sequence_number", seq)
      mf.put("min_sequence_number", seq)
      mf.put("added_snapshot_id", snapshotId)
      mf.put("added_data_files_count", nFiles)
      mf.put("existing_data_files_count", 0)
      mf.put("deleted_data_files_count", 0)
      mf
    }
    val manifestListPath = metaDir.resolve(s"snap-$snapshotId-1-fixture.avro")
    writeAvro(manifestListPath, manifestFileSchemaV2,
      Seq(mfRec(dataManifest, 0, 1L, slices.size), mfRec(delManifest, 1, 2L, 1)),
      Map("format-version" -> "2"))

    val root = mapper.createObjectNode()
    root.put("format-version", 2)
    root.put("table-uuid", java.util.UUID.randomUUID().toString)
    root.put("location", out.toString)
    root.put("last-sequence-number", 2L)
    root.put("last-updated-ms", 0L)
    root.put("last-column-id", lastColumnId)
    // v2 metadata: schemas list + current-schema-id (the single `schema`
    // key is the v1 form — deliberately absent here so the import's v2
    // resolution path is the one exercised)
    val schemas = root.putArray("schemas")
    schemas.add(mapper.readTree(schemaJson))
    root.put("current-schema-id", 0)
    val specs = root.putArray("partition-specs")
    val spec0 = specs.addObject()
    spec0.put("spec-id", 0)
    spec0.putArray("fields")
    root.put("default-spec-id", 0)
    root.put("last-partition-id", 999)
    root.putObject("properties")
    root.put("current-snapshot-id", snapshotId)
    val snaps = root.putArray("snapshots")
    val snap = snaps.addObject()
    snap.put("snapshot-id", snapshotId)
    snap.put("sequence-number", 2L)
    snap.put("timestamp-ms", 0L)
    snap.putObject("summary").put("operation", "overwrite")
    snap.put("manifest-list", manifestListPath.toUri.toString)
    root.putArray("snapshot-log")
    root.putArray("metadata-log")
    Files.write(metaDir.resolve("v2.metadata.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    Files.write(metaDir.resolve("version-hint.text"), "2".getBytes("UTF-8"))
  }
}
