package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, ByteArrayOutputStream, EOFException, InputStream, PushbackInputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC (Web ARChive, ISO 28500) ingest — the front door of a crawl-based
  * training-data pipeline: the first byte a pre-training corpus build ever
  * reads is a WARC file, and everything downstream (main-text extraction,
  * language ID, quality gates, dedup) hangs off this reader.
  *
  * Format facts are public (ISO 28500 / the WARC 1.1 spec): a WARC file is
  * a sequence of records, each `WARC/1.x\r\n` + `Name: value` header lines
  * + blank line + exactly `Content-Length` payload bytes + `\r\n\r\n`.
  * The Common-Crawl convention compresses each record as its OWN gzip
  * member, members concatenated — so the file both streams as one gzip
  * stream AND supports offset-seeking; `java.util.zip.GZIPInputStream`
  * reads concatenated members transparently, which is exactly what the
  * streaming parser leans on.
  *
  * Scale shape: files are read via `sparkContext.binaryFiles`'
  * `PortableDataStream` and parsed INCREMENTALLY — a 1 GB WARC is never
  * materialized as one byte array; records flow out of a lazy iterator
  * with only the current record's payload in memory. Parallelism is one
  * task per WARC file (record framing is sequential), the standard crawl
  * shape: a 100 TB crawl is ~100k files of ~1 GB, far wider than any
  * cluster. Payload bytes stay map-side — project them away before any
  * shuffle (the multimodal rule).
  *
  * Malformed framing REFUSES with the byte context rather than silently
  * resynchronizing — a truncated record boundary that "skips ahead"
  * silently drops crawl data with no signal (the parse-don't-guess rule
  * used across the storage plane).
  *
  * Reference anchor: none — beyond-reference north-star item (crawl
  * ingest). The hand-rolled walker follows the same pattern as the RIFF
  * walker in [[graft.multimodal.VideoCodec]].
  */
object WarcCodec {

  /** One WARC record: the standard headers the pipeline keys on, plus the
    * raw payload. `headers` carries every header verbatim (first-wins on
    * duplicates) for callers that need more than the common five.
    */
  final case class WarcRecord(
      warcType: String,
      targetUri: String,
      date: String,
      contentType: String,
      payload: Array[Byte],
      headers: Map[String, String] = Map.empty)

  private val Crlf = "\r\n".getBytes(StandardCharsets.US_ASCII)

  // ---- encode (fixture/landing side; also what the synthesized oracle uses) ----

  /** Encode one record with the minimal mandatory header set. WARC-Record-ID
    * is derived from (type, uri, date) — deterministic, never a wall-clock
    * or random UUID, so fixtures are byte-stable across runs.
    */
  def encodeRecord(r: WarcRecord): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val recordId = s"<urn:graft:${r.warcType}:${Integer.toHexString((r.targetUri + "|" + r.date).hashCode)}>"
    val head = new StringBuilder()
      .append("WARC/1.0\r\n")
      .append(s"WARC-Type: ${r.warcType}\r\n")
      .append(s"WARC-Record-ID: $recordId\r\n")
      .append(s"WARC-Date: ${r.date}\r\n")
    if (r.targetUri.nonEmpty) head.append(s"WARC-Target-URI: ${r.targetUri}\r\n")
    head
      .append(s"Content-Type: ${r.contentType}\r\n")
      .append(s"Content-Length: ${r.payload.length}\r\n")
      .append("\r\n")
    out.write(head.toString.getBytes(StandardCharsets.US_ASCII))
    out.write(r.payload)
    out.write(Crlf); out.write(Crlf)
    out.toByteArray
  }

  /** Plain (uncompressed) concatenation of records. */
  def encodePlain(records: Seq[WarcRecord]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach(r => out.write(encodeRecord(r)))
    out.toByteArray
  }

  /** Common-Crawl convention: each record its own gzip member, members
    * concatenated.
    */
  def encodeGzip(records: Seq[WarcRecord]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { r =>
      val gz = new GZIPOutputStream(out)
      gz.write(encodeRecord(r))
      // close() (not just finish()) releases the Deflater's native memory
      // immediately instead of holding it until GC; the underlying
      // ByteArrayOutputStream is unaffected by the close
      gz.close()
    }
    out.toByteArray
  }

  /** Wrap an HTTP response payload (status line + headers + body) the way
    * response records carry them (`Content-Type: application/http`).
    */
  def httpResponsePayload(
      status: Int, reason: String, contentType: String,
      body: Array[Byte]): Array[Byte] = {
    val head = (s"HTTP/1.1 $status $reason\r\n" +
      s"Content-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(StandardCharsets.US_ASCII)
    val out = new ByteArrayOutputStream()
    out.write(head); out.write(body)
    out.toByteArray
  }

  // ---- decode ----

  /** Streaming parse: lazy record iterator over an input stream, gzip
    * auto-detected by magic bytes (concatenated members supported). Only
    * the current record's payload is ever resident.
    */
  def parse(in: InputStream): Iterator[WarcRecord] = {
    val pb = new PushbackInputStream(new BufferedInputStream(in, 1 << 16), 2)
    val b0 = pb.read(); val b1 = pb.read()
    if (b1 != -1) { pb.unread(b1); pb.unread(b0) } else if (b0 != -1) pb.unread(b0)
    val stream: InputStream =
      if (b0 == 0x1f && b1 == 0x8b) new BufferedInputStream(new GZIPInputStream(pb), 1 << 16)
      else pb
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = _
      private var done = false
      private def advance(): Unit = if (nextRec == null && !done) {
        readRecord(stream) match {
          case Some(r) => nextRec = r
          case None    => done = true
        }
      }
      override def hasNext: Boolean = { advance(); !done }
      override def next(): WarcRecord = {
        advance()
        if (done) throw new NoSuchElementException("past end of WARC stream")
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /** Convenience: parse an in-memory WARC (fixtures, small files). */
  def parse(bytes: Array[Byte]): Seq[WarcRecord] =
    parse(new ByteArrayInputStream(bytes)).toSeq

  /** Read one ASCII header line up to LF; strips the trailing CR. Returns
    * null at EOF before any byte.
    */
  private def readLine(in: InputStream): String = {
    val buf = new ByteArrayOutputStream(128)
    var c = in.read()
    if (c == -1) return null
    while (c != -1 && c != '\n') { buf.write(c); c = in.read() }
    val s = buf.toString(StandardCharsets.US_ASCII.name)
    if (s.endsWith("\r")) s.dropRight(1) else s
  }

  private def readRecord(in: InputStream): Option[WarcRecord] = {
    // skip inter-record blank lines; a version line or EOF must follow
    var line = readLine(in)
    while (line != null && line.isEmpty) line = readLine(in)
    if (line == null) return None
    require(line.startsWith("WARC/"),
      s"malformed WARC: expected version line, got '${line.take(64)}' — refusing to resynchronize")
    val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var h = readLine(in)
    while (h != null && h.nonEmpty) {
      val i = h.indexOf(':')
      require(i > 0, s"malformed WARC header line '${h.take(64)}'")
      val k = h.substring(0, i).trim
      if (!headers.contains(k)) headers += k -> h.substring(i + 1).trim
      h = readLine(in)
    }
    require(h != null, "malformed WARC: EOF inside record headers")
    val lenStr = headers.iterator.collectFirst {
      case (k, v) if k.equalsIgnoreCase("Content-Length") => v }
      .getOrElse(throw new IllegalArgumentException(
        "malformed WARC: record without Content-Length"))
    val len = lenStr.toLong
    require(len >= 0 && len <= Int.MaxValue - 8, s"unsupported WARC payload length $len")
    val payload = new Array[Byte](len.toInt)
    var off = 0
    while (off < payload.length) {
      val n = in.read(payload, off, payload.length - off)
      if (n < 0) throw new EOFException(
        s"malformed WARC: payload truncated at $off of $len bytes")
      off += n
    }
    def get(name: String): String = headers.iterator.collectFirst {
      case (k, v) if k.equalsIgnoreCase(name) => v }.getOrElse("")
    Some(WarcRecord(
      warcType = get("WARC-Type"),
      targetUri = get("WARC-Target-URI"),
      date = get("WARC-Date"),
      contentType = get("Content-Type"),
      payload = payload,
      headers = headers.toMap))
  }

  // ---- HTTP payload split (response records) ----

  /** Split an `application/http` payload into (statusCode, contentType,
    * body). A payload that is not an HTTP message comes back as
    * (0, "", payload) — non-http record types (warcinfo, metadata) carry
    * their payload through unchanged.
    */
  def splitHttp(payload: Array[Byte]): (Int, String, Array[Byte]) = {
    val sep = indexOfDoubleCrlf(payload)
    if (sep < 0) return (0, "", payload)
    val head = new String(payload, 0, sep, StandardCharsets.US_ASCII)
    val lines = head.split("\r\n")
    if (lines.isEmpty || !lines(0).startsWith("HTTP/")) return (0, "", payload)
    val status = lines(0).split(" ")
      .drop(1).headOption.flatMap(_.toIntOption).getOrElse(0)
    val ct = lines.drop(1).collectFirst {
      case l if l.toLowerCase.startsWith("content-type:") =>
        l.substring(l.indexOf(':') + 1).trim
    }.getOrElse("")
    (status, ct, java.util.Arrays.copyOfRange(payload, sep + 4, payload.length))
  }

  private def indexOfDoubleCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }
}

/** Spark-side WARC reader: one row per record, HTTP responses pre-split.
  * See [[WarcCodec]] for the scale shape (streaming per-file parse, one
  * task per file).
  */
object WarcIO {

  /** One parsed record row. `body` is the HTTP body for `application/http`
    * response records, the raw payload otherwise; `http_status` is 0 for
    * non-http records.
    */
  final case class WarcRow(
      warc_file: String,
      record_idx: Long,
      warc_type: String,
      url: String,
      warc_date: String,
      content_type: String,
      http_status: Int,
      http_content_type: String,
      body: Array[Byte])

  /** Read every WARC under `path` (glob-able — append a `*.warc.gz`
    * pattern to target the crawl files). `minPartitions` widens the
    * file-to-task fan-out for small file counts; at crawl scale the file
    * count dominates any setting.
    */
  def read(spark: SparkSession, path: String, minPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val parts = if (minPartitions > 0) minPartitions
      else spark.sparkContext.defaultMinPartitions
    spark.sparkContext.binaryFiles(path, parts)
      .flatMap { case (file, pds) =>
        // records are consumed lazily within the flatMap; the stream is
        // closed by a task-completion listener, which fires even when the
        // iterator is only partially drained (downstream limit/take) — a
        // bare pds.open() would leak one file handle per such task
        val in = pds.open()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ =>
            try in.close() catch { case _: java.io.IOException => () }))
        toRows(file, WarcCodec.parse(in))
      }
      .toDS()
      .toDF()
  }

  /** Record → row projection shared by the batch reader and the streaming
    * ingest ([[graft.streaming.CrawlStream]]) so both land the identical
    * shape.
    */
  private[graft] def toRows(
      file: String, recs: Iterator[WarcCodec.WarcRecord]): Iterator[WarcRow] =
    recs.zipWithIndex.map { case (r, i) =>
      val (status, httpCt, body) =
        if (r.contentType.toLowerCase.startsWith("application/http"))
          WarcCodec.splitHttp(r.payload)
        else (0, "", r.payload)
      WarcRow(file, i.toLong, r.warcType, r.targetUri, r.date,
        r.contentType, status, httpCt, body)
    }
}
