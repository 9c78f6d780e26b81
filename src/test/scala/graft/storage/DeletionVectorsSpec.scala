package graft.storage

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Delta deletion vectors (delta.io PROTOCOL.md "Deletion Vectors"):
  * the Z85 text layer against the ZeroMQ RFC 32 reference vector, the
  * RoaringBitmapArray portable bytes, the shared-bin-file layout with
  * CRC gates, and the end-to-end contract — a table whose adds carry
  * DVs serves exactly its live rows, across waves (bitmap-union
  * superset rule), checkpoints, and the reader-protocol gate.
  */
class DeletionVectorsSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def onePart(df: org.apache.spark.sql.DataFrame,
      dst: java.nio.file.Path): Unit = {
    val t = Files.createTempDirectory("graft_dv_part_")
    df.coalesce(1).write.mode("overwrite").parquet(t.toString)
    val s = Files.list(t)
    val part = try s.iterator().asScala.filter { p =>
      val n = p.getFileName.toString
      n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
    }.toSeq match {
      case Seq(one) => one
      case other => fail(s"expected one part file, got ${other.size}")
    } finally s.close()
    Files.move(part, dst, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** A 3-file unpartitioned Delta table over ids 0..89 with v = id*10. */
  private def threeFileTable(): String = {
    val out = tmp("dv_tbl_") + "/t"
    Files.createDirectories(Paths.get(out))
    val df = spark.range(90).select(col("id"), (col("id") * 10).as("v"))
    onePart(df.filter(col("id") < 30), Paths.get(out, "a.parquet"))
    onePart(df.filter(col("id") >= 30 && col("id") < 60), Paths.get(out, "b.parquet"))
    onePart(df.filter(col("id") >= 60), Paths.get(out, "c.parquet"))
    DeltaInterop.writeCommit(out, 0L,
      adds = Seq("a.parquet", "b.parquet", "c.parquet"),
      schemaJson = Some(df.schema.json))
    out
  }

  private def servedIds(dir: String): Set[Long] =
    DeltaInterop.importSnapshot(spark, dir).select("id").as[Long].collect().toSet

  // ------------------------------------------------------------- codec

  test("Z85 matches the ZeroMQ RFC 32 reference vector and round-trips") {
    // the spec's worked example: 86 4F D2 6F B5 59 F7 5B <-> "HelloWorld"
    val ref = Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b).map(_.toByte)
    assert(DeletionVectors.z85Encode(ref) == "HelloWorld")
    assert(DeletionVectors.z85Decode("HelloWorld").toSeq == ref.toSeq)

    val rnd = new scala.util.Random(7)
    for (len <- Seq(4, 16, 40, 1000)) {
      val b = Array.fill(len)(rnd.nextInt(256).toByte)
      assert(DeletionVectors.z85Decode(DeletionVectors.z85Encode(b)).toSeq == b.toSeq)
    }
    // padded arm: arbitrary lengths survive via the descriptor's size
    for (len <- Seq(1, 2, 3, 5, 17, 103)) {
      val b = Array.fill(len)(rnd.nextInt(256).toByte)
      val enc = DeletionVectors.z85EncodePadded(b)
      assert(DeletionVectors.z85DecodePadded(enc, len).toSeq == b.toSeq)
    }
    intercept[IllegalArgumentException](DeletionVectors.z85Decode("abcd~"))
  }

  test("RoaringBitmapArray bytes round-trip, including rows above 2^32") {
    val rows = Array(0L, 1L, 5L, 1000000L, (1L << 32) | 7L, (5L << 32) | 123L,
      (5L << 32) | 124L)
    val bytes = DeletionVectors.serializeBitmapArray(rows)
    // portable layout head: LE magic + bitmap count (keys 0, 1, 5)
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(buf.getInt == DeletionVectors.MagicPortable)
    assert(buf.getLong == 3L)
    assert(DeletionVectors.deserializeBitmapArray(bytes).toSeq == rows.toSeq.sorted)

    val rnd = new scala.util.Random(11)
    val big = Array.fill(5000)(rnd.nextLong().abs % (1L << 40)).distinct
    assert(DeletionVectors.deserializeBitmapArray(
      DeletionVectors.serializeBitmapArray(big)).toSeq == big.toSeq.sorted)
  }

  test("DV bin file: shared file, non-zero offsets, CRC + size gates") {
    val root = Paths.get(tmp("dv_bin_"))
    val p1 = DeletionVectors.serializeBitmapArray(Seq(1L, 2L, 3L))
    val p2 = DeletionVectors.serializeBitmapArray(Seq(10L, 20L))
    val (pathOrInline, placements) = DeletionVectors.writeDvFile(root, Seq(p1, p2))
    assert(placements.head.offset == 1, "first DV starts right after the version byte")
    assert(placements(1).offset > placements.head.offset)

    val d1 = DeletionVectors.DvDescriptor("u", pathOrInline,
      Some(placements.head.offset), p1.length, 3L)
    val d2 = DeletionVectors.DvDescriptor("u", pathOrInline,
      Some(placements(1).offset), p2.length, 2L)
    assert(DeletionVectors.deletedRows(root, d1).toSeq == Seq(1L, 2L, 3L))
    assert(DeletionVectors.deletedRows(root, d2).toSeq == Seq(10L, 20L))

    // cardinality gate
    intercept[IllegalArgumentException](
      DeletionVectors.deletedRows(root, d1.copy(cardinality = 4L)))

    // flip one payload byte: CRC must catch it
    val file = DeletionVectors.descriptorPath(root, d1)
    val all = Files.readAllBytes(file)
    all(placements.head.offset + 4 + 2) = (all(placements.head.offset + 4 + 2) ^ 0x40).toByte
    Files.write(file, all)
    val e = intercept[IllegalArgumentException](DeletionVectors.deletedRows(root, d1))
    assert(e.getMessage.contains("checksum"))
    // size-field gate on the OTHER (uncorrupted payload bytes, wrong declared size)
    intercept[IllegalArgumentException](
      DeletionVectors.deletedRows(root, d2.copy(sizeInBytes = p2.length - 1)))
  }

  // ------------------------------------------------------ end to end

  test("deleteWhere masks rows via DVs; second wave merges into a superset") {
    val out = threeFileTable()
    val n1 = DeltaInterop.deleteWhere(spark, out, 1L, col("id") % 7 === 3)
    assert(n1 == (0L until 90L).count(_ % 7 == 3))
    assert(servedIds(out) == (0L until 90L).filter(_ % 7 != 3).toSet)

    // wave 2 hits files that already carry DVs — union, newly-only count
    val n2 = DeltaInterop.deleteWhere(spark, out, 2L, col("id") % 7 === 3 || col("id") % 11 === 5)
    assert(n2 == (0L until 90L).count(i => i % 11 == 5 && i % 7 != 3))
    assert(servedIds(out) ==
      (0L until 90L).filter(i => i % 7 != 3 && i % 11 != 5).toSet)

    // one shared bin file per wave, offsets advancing
    val log1 = Files.readAllLines(
      Paths.get(out, "_delta_log", f"${1L}%020d.json")).asScala.filter(_.nonEmpty)
    val adds = log1.map(mapper.readTree(_)).flatMap(n => Option(n.get("add")))
    val dvs = adds.flatMap(a => Option(a.get("deletionVector")))
    assert(dvs.nonEmpty && dvs.forall(_.get("storageType").asText() == "u"))
    assert(dvs.map(_.get("pathOrInlineDv").asText()).distinct.size == 1,
      "all of a wave's DVs share one bin file")
    assert(dvs.map(_.get("offset").asInt()).distinct.size == dvs.size)
    // protocol upgraded in the same commit
    val proto = log1.map(mapper.readTree(_)).flatMap(n => Option(n.get("protocol")))
    assert(proto.exists(p => p.get("minReaderVersion").asInt() == 3 &&
      p.get("readerFeatures").elements().asScala.map(_.asText()).contains("deletionVectors")))
  }

  test("inline DVs (storageType i) serve the same masked table") {
    val out = threeFileTable()
    val n = DeltaInterop.deleteWhere(spark, out, 1L, col("id") < 10, inline = true)
    assert(n == 10L)
    assert(servedIds(out) == (10L until 90L).toSet)
    val log1 = Files.readAllLines(
      Paths.get(out, "_delta_log", f"${1L}%020d.json")).asScala.filter(_.nonEmpty)
    val dvs = log1.map(mapper.readTree(_))
      .flatMap(n0 => Option(n0.get("add"))).flatMap(a => Option(a.get("deletionVector")))
    assert(dvs.nonEmpty && dvs.forall(_.get("storageType").asText() == "i"))
    assert(dvs.forall(d => Option(d.get("offset")).forall(_.isNull)))
  }

  test("checkpoint carries deletion vectors — import from base alone stays masked") {
    val out = threeFileTable()
    DeltaInterop.deleteWhere(spark, out, 1L, col("id") % 5 === 0)
    DeltaInterop.writeCheckpoint(spark, out, 1L)
    // drop the tail commits: the base state ALONE must serve masked rows
    Files.delete(Paths.get(out, "_delta_log", f"${0L}%020d.json"))
    Files.delete(Paths.get(out, "_delta_log", f"${1L}%020d.json"))
    assert(servedIds(out) == (0L until 90L).filter(_ % 5 != 0).toSet)
    // checkpoint add rows carry the descriptor struct
    val cp = spark.read.parquet(
      Paths.get(out, "_delta_log", f"${1L}%020d.checkpoint.parquet").toString)
    val withDv = cp.filter(col("add").isNotNull &&
      col("add.deletionVector").isNotNull).count()
    assert(withDv == 3L, "every touched file's checkpoint row keeps its DV")
    // tail on top of the DV'd checkpoint still replays
    DeltaInterop.deleteWhere(spark, out, 2L, col("id") === 81L)
    assert(servedIds(out) == (0L until 90L).filter(i => i % 5 != 0 && i != 81L).toSet)
  }

  test("reader-protocol gate: unknown reader features and v2 refuse loudly") {
    val out = threeFileTable()
    DeltaInterop.deleteWhere(spark, out, 1L, col("id") === 0L)
    // plant an unsupported reader feature on top
    val extra = mapper.createObjectNode()
    val p = extra.putObject("protocol")
    p.put("minReaderVersion", 3); p.put("minWriterVersion", 7)
    // columnMapping graduated to a SUPPORTED feature in round 15 (name
    // mode) — the unknown-feature arm now plants v2Checkpoint instead
    p.putArray("readerFeatures").add("deletionVectors").add("v2Checkpoint")
    Files.write(Paths.get(out, "_delta_log", f"${2L}%020d.json"),
      (mapper.writeValueAsString(extra) + "\n").getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](
      DeltaInterop.importSnapshot(spark, out))
    assert(e.getMessage.contains("v2Checkpoint"))

    // reader v2 WITHOUT name-mode mapping declared is a capability we
    // lack (v2 = column mapping and the metaData names no mode)
    val out2 = threeFileTable()
    val v2 = mapper.createObjectNode()
    val p2 = v2.putObject("protocol")
    p2.put("minReaderVersion", 2); p2.put("minWriterVersion", 5)
    Files.write(Paths.get(out2, "_delta_log", f"${1L}%020d.json"),
      (mapper.writeValueAsString(v2) + "\n").getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException](
      DeltaInterop.importSnapshot(spark, out2))
    assert(e2.getMessage.contains("delta.columnMapping.mode (name|id)"))
  }

  test("purge rewrites DV'd files clean: same rows, no DVs, fully-dead file retired") {
    val out = threeFileTable()
    DeltaInterop.deleteWhere(spark, out, 1L, col("id") % 4 === 1)
    DeltaInterop.deleteWhere(spark, out, 2L, col("id") >= 60L) // kills c.parquet entirely
    val expect = (0L until 90L).filter(i => i % 4 != 1 && i < 60).toSet
    assert(servedIds(out) == expect)
    val n = DeltaInterop.purgeDeletionVectors(spark, out, 3L)
    assert(n == 3, "all three files carried DVs")
    assert(servedIds(out) == expect, "purge must not change the served rows")
    // post-purge state: no deletionVector anywhere, c.parquet retired with
    // no replacement, rewritten files physically smaller than their masks
    val log3 = Files.readAllLines(
      Paths.get(out, "_delta_log", f"${3L}%020d.json")).asScala.filter(_.nonEmpty)
      .map(mapper.readTree(_))
    val adds = log3.flatMap(n0 => Option(n0.get("add")))
    assert(adds.size == 2 && adds.forall(a => Option(a.get("deletionVector")).isEmpty))
    val removes = log3.flatMap(n0 => Option(n0.get("remove")))
      .map(_.get("path").asText()).toSet
    assert(removes == Set("a.parquet", "b.parquet", "c.parquet"))
    // rewritten files keep original row order (row_index order)
    val aNew = adds.map(_.get("path").asText()).find(_.startsWith("a-")).get
    val rows = spark.read.parquet(Paths.get(out, aNew).toString)
      .select("id").as[Long].collect().toSeq
    assert(rows == rows.sorted && rows.toSet == (0L until 30L).filter(_ % 4 != 1).toSet)
    // a further delete wave starts a fresh DV history on the clean files
    DeltaInterop.deleteWhere(spark, out, 4L, col("id") === 2L)
    assert(servedIds(out) == expect - 2L)
  }

  test("unknown DV storageType refuses instead of serving deleted rows") {
    val out = threeFileTable()
    DeltaInterop.deleteWhere(spark, out, 1L, col("id") === 1L)
    val commit = Paths.get(out, "_delta_log", f"${1L}%020d.json")
    val patched = Files.readAllLines(commit).asScala.map(
      _.replace("\"storageType\":\"u\"", "\"storageType\":\"x\""))
    Files.write(commit, patched.mkString("", "\n", "\n").getBytes("UTF-8"))
    val e = intercept[Exception](servedIds(out))
    assert(e.getMessage != null && e.getMessage.contains("storageType"))
  }
}
