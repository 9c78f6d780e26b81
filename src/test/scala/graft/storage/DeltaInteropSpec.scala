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
