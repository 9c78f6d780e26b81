package graft.storage

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path}
import java.util.UUID
import java.util.zip.CRC32

import org.roaringbitmap.RoaringBitmap

/** Delta Lake deletion-vector format (delta.io PROTOCOL.md, "Deletion
  * Vectors" + "Deletion Vector Descriptor Schema" + "Deletion Vector
  * Format"): the row-level delete representation modern Delta writers
  * (Spark 3.4+, Databricks, delta-rs) attach to `add` actions instead of
  * rewriting data files. A reader that ignores the `deletionVector` field
  * silently serves deleted rows — the wrong-looking-right failure class
  * the Iceberg v2 bridge closed for delete manifests (q146/q152); this
  * module closes it for the Delta bridge.
  *
  * Three layers, each from the public spec:
  *
  *  1. '''Z85 text encoding''' (ZeroMQ RFC 32, the alphabet PROTOCOL.md
  *     names for `pathOrInlineDv`): 4 binary bytes → 5 chars, big-endian
  *     base-85 within each group. UUIDs are 16 bytes → exactly 20 chars;
  *     inline DV payloads of arbitrary length are zero-padded to a
  *     4-byte multiple on encode and truncated to the descriptor's
  *     `sizeInBytes` on decode (the Base85 convention Delta's own codec
  *     uses — the pad bytes are never ambiguous because the true length
  *     rides in the descriptor).
  *
  *  2. '''RoaringBitmapArray, portable serialization''' (PROTOCOL.md
  *     "Deletion Vector Format"): little-endian magic `1681511377`,
  *     an int64 count of 32-bit bitmaps, then per bitmap its int32 high
  *     key followed by the standard portable 32-bit RoaringBitmap
  *     (RoaringFormatSpec — `org.roaringbitmap.RoaringBitmap`'s native
  *     serialize/deserialize, the jar Spark itself ships). A row index
  *     `r` lives in bitmap `r >>> 32` at unsigned low word `r & 0xffffffff`.
  *     No reference Delta reader exists in this offline sandbox, so the
  *     validation story is the Iceberg-bridge one: spec-cited structure
  *     asserts, the inverse reader, and oracle-certified round trips
  *     (q153) — any layout slip breaks the census hash.
  *
  *  3. '''On-disk DV file''' (PROTOCOL.md "Deletion Vector File Storage
  *     Format"): a 1-byte format version (`1`), then each DV stored as
  *     `<dataSize: int32 BE> <data> <CRC-32 of data: int32 BE>`; the
  *     descriptor's `offset` points at the size field and `sizeInBytes`
  *     must equal the stored size. Several DVs share one file (the real
  *     writer shape — one file per commit, not per data file).
  */
object DeletionVectors {

  /** Descriptor exactly as it appears under `add.deletionVector`
    * (PROTOCOL.md "Deletion Vector Descriptor Schema"). `storageType`:
    * `"u"` = relative file named by a Z85 UUID (+ optional random
    * prefix), `"i"` = inline Z85 payload, `"p"` = absolute path.
    */
  final case class DvDescriptor(
      storageType: String,
      pathOrInlineDv: String,
      offset: Option[Int],
      sizeInBytes: Int,
      cardinality: Long)

  // ---------------------------------------------------------------- Z85

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Reverse: Array[Int] = {
    val r = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => r(c.toInt) = i }
    r
  }

  /** Z85-encode; `bytes.length` must be a multiple of 4 (RFC 32 frames). */
  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0,
      s"Z85 encodes 4-byte groups, got ${bytes.length} bytes — pad first")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      var k = 4
      val tmp = new Array[Char](5)
      while (k >= 0) { tmp(k) = Z85Alphabet((v % 85).toInt); v /= 85; k -= 1 }
      sb.appendAll(tmp)
      i += 4
    }
    sb.toString
  }

  /** Z85-decode; `s.length` must be a multiple of 5. */
  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0,
      s"Z85 decodes 5-char groups, got ${s.length} chars")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Reverse(c.toInt) else -1
        require(d >= 0, s"invalid Z85 character '$c' at ${i + j}")
        v = v * 85 + d
        j += 1
      }
      require(v <= 0xffffffffL, s"Z85 group at $i decodes above 2^32")
      val base = i / 5 * 4
      out(base) = (v >>> 24).toByte; out(base + 1) = (v >>> 16).toByte
      out(base + 2) = (v >>> 8).toByte; out(base + 3) = v.toByte
      i += 5
    }
    out
  }

  /** Encode arbitrary-length bytes: zero-pad to a 4-byte multiple (the
    * true length travels in the descriptor's `sizeInBytes`).
    */
  def z85EncodePadded(bytes: Array[Byte]): String = {
    val pad = (4 - bytes.length % 4) % 4
    z85Encode(if (pad == 0) bytes else bytes ++ Array.fill(pad)(0.toByte))
  }

  /** Decode and truncate to the descriptor-declared length. */
  def z85DecodePadded(s: String, sizeInBytes: Int): Array[Byte] = {
    val raw = z85Decode(s)
    require(raw.length >= sizeInBytes && raw.length - sizeInBytes < 4,
      s"inline DV length ${raw.length} inconsistent with sizeInBytes $sizeInBytes")
    raw.take(sizeInBytes)
  }

  // ------------------------------------------- RoaringBitmapArray bytes

  /** PROTOCOL.md "Deletion Vector Format" portable magic. */
  val MagicPortable: Int = 1681511377

  /** Serialize sorted-or-not row indexes (≥ 0) into the portable
    * RoaringBitmapArray layout. Size is bounded by the bitmap's own
    * compressed form — the bytes any DV writer must hold to emit a file.
    */
  def serializeBitmapArray(rows: IterableOnce[Long]): Array[Byte] = {
    val buckets = new java.util.TreeMap[Integer, RoaringBitmap]()
    rows.iterator.foreach { r =>
      require(r >= 0, s"negative row index $r")
      val hi = (r >>> 32).toInt
      var bm = buckets.get(hi)
      if (bm == null) { bm = new RoaringBitmap(); buckets.put(hi, bm) }
      bm.add(r.toInt) // low 32 bits, unsigned semantics
    }
    import scala.jdk.CollectionConverters._
    val entries = buckets.entrySet().asScala.toSeq
    entries.foreach(_.getValue.runOptimize())
    val total = 4 + 8 + entries.map(e => 4 + e.getValue.serializedSizeInBytes()).sum
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(MagicPortable)
    buf.putLong(entries.size.toLong)
    entries.foreach { e =>
      buf.putInt(e.getKey)
      e.getValue.serialize(buf)
    }
    require(buf.remaining() == 0,
      s"bitmap serialization size mismatch: ${buf.remaining()} bytes left")
    buf.array()
  }

  /** Inverse of [[serializeBitmapArray]]: sorted 64-bit row indexes. */
  def deserializeBitmapArray(bytes: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.remaining() >= 12, s"DV payload too short: ${bytes.length} bytes")
    val magic = buf.getInt
    require(magic == MagicPortable,
      s"bad RoaringBitmapArray magic $magic (want $MagicPortable — only the " +
        "portable serialization is spec'd for deletion vectors)")
    val n = buf.getLong
    require(n >= 0 && n <= Int.MaxValue, s"implausible bitmap count $n")
    val out = Array.newBuilder[Long]
    var lastKey = Long.MinValue
    var i = 0L
    while (i < n) {
      val key = buf.getInt
      require(key >= 0 && key > lastKey,
        s"bitmap keys must be increasing and non-negative, got $key after $lastKey")
      lastKey = key
      val bm = new RoaringBitmap()
      bm.deserialize(buf)
      // deserialize(ByteBuffer) does not advance the buffer position
      buf.position(buf.position() + bm.serializedSizeInBytes())
      val hiBits = key.toLong << 32
      bm.forEach(((v: Int) =>
        out += (hiBits | Integer.toUnsignedLong(v))): org.roaringbitmap.IntConsumer)
      i += 1
    }
    out.result()
  }

  // ------------------------------------------------------- DV bin files

  /** One stored DV's placement inside a shared bin file. */
  final case class StoredDv(offset: Int, sizeInBytes: Int)

  /** Write several serialized DVs into ONE `deletion_vector_<uuid>.bin`
    * under `tableRoot` (PROTOCOL.md file layout: version byte, then per
    * DV `<size BE> <data> <crc32 BE>`). Returns the `pathOrInlineDv`
    * value (optional random prefix + Z85 UUID) and each DV's placement,
    * in input order.
    */
  def writeDvFile(
      tableRoot: Path, payloads: Seq[Array[Byte]],
      prefix: String = ""): (String, Seq[StoredDv]) = {
    require(payloads.nonEmpty, "writeDvFile needs at least one DV payload")
    val uuid = UUID.randomUUID()
    val rel = dvFileRelPath(prefix, uuid)
    val total = 1 + payloads.map(p => 4 + p.length + 4).sum
    val buf = ByteBuffer.allocate(total) // BIG endian (spec: sizes/CRCs BE)
    buf.put(1.toByte) // format version
    val placements = payloads.map { p =>
      val off = buf.position()
      buf.putInt(p.length)
      buf.put(p)
      val crc = new CRC32(); crc.update(p)
      buf.putInt(crc.getValue.toInt)
      StoredDv(off, p.length)
    }
    val abs = tableRoot.resolve(rel)
    Option(abs.getParent).foreach(Files.createDirectories(_))
    Files.write(abs, buf.array())
    val uuidBytes = ByteBuffer.allocate(16)
      .putLong(uuid.getMostSignificantBits)
      .putLong(uuid.getLeastSignificantBits).array()
    (prefix + z85Encode(uuidBytes), placements)
  }

  /** Relative path of a `"u"`-storage DV file (PROTOCOL.md "Derived
    * Fields": `<prefix>/deletion_vector_<uuid>.bin` under the table root).
    */
  def dvFileRelPath(prefix: String, uuid: UUID): String = {
    val dir = if (prefix.isEmpty) "" else prefix.stripSuffix("/") + "/"
    s"${dir}deletion_vector_$uuid.bin"
  }

  /** Resolve a descriptor to the absolute DV file path (storage types
    * `"u"` and `"p"`; `"i"` carries its payload inline).
    */
  def descriptorPath(tableRoot: Path, d: DvDescriptor): Path = d.storageType match {
    case "u" =>
      require(d.pathOrInlineDv.length >= 20,
        s"'u' pathOrInlineDv too short for a Z85 UUID: '${d.pathOrInlineDv}'")
      val prefix = d.pathOrInlineDv.dropRight(20)
      val enc = d.pathOrInlineDv.takeRight(20)
      val raw = z85Decode(enc)
      val bb = ByteBuffer.wrap(raw)
      val uuid = new UUID(bb.getLong, bb.getLong)
      tableRoot.resolve(dvFileRelPath(prefix, uuid))
    case "p" => java.nio.file.Paths.get(d.pathOrInlineDv)
    case other => throw new IllegalArgumentException(
      s"descriptorPath on storageType '$other'")
  }

  /** Read one DV's serialized bytes out of a bin file, verifying the
    * stored size against the descriptor and the CRC-32 against the bytes
    * (both loud — a corrupt DV silently under-deleting is the exact
    * failure this format's checksums exist to prevent).
    */
  def readDvBytes(file: Path, offset: Int, sizeInBytes: Int): Array[Byte] = {
    val all = Files.readAllBytes(file)
    require(all.length >= 1 && all(0) == 1,
      s"unsupported DV file format version ${if (all.isEmpty) "<empty>" else all(0)} at $file")
    require(offset >= 1 && offset + 4 + sizeInBytes + 4 <= all.length,
      s"DV extent [$offset, +${4 + sizeInBytes + 4}) outside file of ${all.length} bytes: $file")
    val buf = ByteBuffer.wrap(all, offset, 4 + sizeInBytes + 4)
    val storedSize = buf.getInt
    require(storedSize == sizeInBytes,
      s"DV size mismatch at $file:$offset — descriptor says $sizeInBytes, file says $storedSize")
    val data = new Array[Byte](sizeInBytes)
    buf.get(data)
    val storedCrc = buf.getInt
    val crc = new CRC32(); crc.update(data)
    require(crc.getValue.toInt == storedCrc,
      f"DV checksum mismatch at $file:$offset — stored 0x$storedCrc%08x, computed 0x${crc.getValue.toInt}%08x")
    data
  }

  /** Materialize a descriptor's deleted row indexes (sorted). Runs on
    * executors in the import path — one descriptor's worth of work, bytes
    * bounded by the DV's own compressed size.
    */
  def deletedRows(tableRoot: Path, d: DvDescriptor): Array[Long] = {
    val payload = d.storageType match {
      case "i" => z85DecodePadded(d.pathOrInlineDv, d.sizeInBytes)
      case "u" | "p" =>
        val off = d.offset.getOrElse(throw new IllegalArgumentException(
          s"file-stored DV lacks offset: $d"))
        readDvBytes(descriptorPath(tableRoot, d), off, d.sizeInBytes)
      case other => throw new IllegalArgumentException(
        s"unknown deletion-vector storageType '$other' — refusing (silently " +
          "ignoring it would serve deleted rows)")
    }
    val rows = deserializeBitmapArray(payload)
    require(rows.length == d.cardinality,
      s"DV cardinality mismatch: descriptor says ${d.cardinality}, bitmap holds ${rows.length}")
    rows
  }
}
