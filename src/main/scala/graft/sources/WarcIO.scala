package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, ByteArrayOutputStream, EOFException, InputStream, PushbackInputStream}
import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}
import java.util.zip.{DataFormatException, GZIPInputStream, GZIPOutputStream, Inflater}

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
    // extra headers (e.g. WARC-Payload-Digest, WARC-Profile for revisit
    // records) in sorted-key order so fixtures stay byte-stable; the
    // standard five above are writer-owned and skipped here
    val std = Set("warc-type", "warc-record-id", "warc-date",
      "warc-target-uri", "content-type", "content-length")
    r.headers.toSeq.filterNot(kv => std.contains(kv._1.toLowerCase))
      .sortBy(_._1).foreach { case (k, v) => head.append(s"$k: $v\r\n") }
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
      body: Array[Byte]): Array[Byte] =
    httpResponsePayloadEncoded(status, reason, contentType, body)

  /** Fixture-side encoder exercising the real HTTP transport framings a
    * crawl delivers (RFC 9112): `gzipBody` applies `Content-Encoding:
    * gzip`, `chunked` applies `Transfer-Encoding: chunked` (chunk-size hex
    * lines + terminal 0-chunk; `Content-Length` omitted, as the RFC
    * requires for chunked messages). Encodings compose in wire order —
    * content-coding first, then transfer-coding — exactly what
    * [[decodeHttp]] must undo in reverse.
    */
  def httpResponsePayloadEncoded(
      status: Int, reason: String, contentType: String, body: Array[Byte],
      gzipBody: Boolean = false, chunked: Boolean = false,
      chunkSize: Int = 100): Array[Byte] = {
    val enc = if (gzipBody) gzipOnce(body) else body
    val framed = if (chunked) encodeChunked(enc, chunkSize) else enc
    val head = new StringBuilder(s"HTTP/1.1 $status $reason\r\n")
      .append(s"Content-Type: $contentType\r\n")
    if (gzipBody) head.append("Content-Encoding: gzip\r\n")
    if (chunked) head.append("Transfer-Encoding: chunked\r\n")
    else head.append(s"Content-Length: ${framed.length}\r\n")
    head.append("\r\n")
    val out = new ByteArrayOutputStream()
    out.write(head.toString.getBytes(StandardCharsets.US_ASCII))
    out.write(framed)
    out.toByteArray
  }

  /** Fixture-side encoder for an ARBITRARY `Content-Encoding` list:
    * each member is applied left-to-right (RFC 9110 §8.4 wire order) —
    * `gzip`/`x-gzip` gzip, `deflate` zlib-wraps, `identity` is a no-op,
    * and a coding with no codec here (`br`, `zstd`) leaves the bytes
    * untouched while still being NAMED in the header (exactly the
    * passthrough shape a census must count). `chunked` then applies the
    * transfer-coding on top.
    */
  def httpResponsePayloadCodings(
      status: Int, reason: String, contentType: String, body: Array[Byte],
      codings: Seq[String], chunked: Boolean = false,
      chunkSize: Int = 100): Array[Byte] = {
    val enc = codings.foldLeft(body) { (b, c) =>
      c.toLowerCase match {
        case "gzip" | "x-gzip" => gzipOnce(b)
        case "deflate"         => deflateOnce(b)
        case _                 => b // identity / br / zstd: bytes unchanged
      }
    }
    val framed = if (chunked) encodeChunked(enc, chunkSize) else enc
    val head = new StringBuilder(s"HTTP/1.1 $status $reason\r\n")
      .append(s"Content-Type: $contentType\r\n")
    if (codings.nonEmpty) head.append(s"Content-Encoding: ${codings.mkString(", ")}\r\n")
    if (chunked) head.append("Transfer-Encoding: chunked\r\n")
    else head.append(s"Content-Length: ${framed.length}\r\n")
    head.append("\r\n")
    val out = new ByteArrayOutputStream()
    out.write(head.toString.getBytes(StandardCharsets.US_ASCII))
    out.write(framed)
    out.toByteArray
  }

  /** One zlib-wrapped deflate pass over `b` (fixture side). */
  def deflateOnce(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b); d.finish()
    val out = new ByteArrayOutputStream(b.length / 2 + 16)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** One gzip member over `b` (fixture side). */
  def gzipOnce(b: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(out)
    gz.write(b); gz.close()
    out.toByteArray
  }

  /** Chunked transfer-coding of `b` in `chunkSize`-byte chunks. */
  def encodeChunked(b: Array[Byte], chunkSize: Int = 100): Array[Byte] = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    val out = new ByteArrayOutputStream(b.length + 64)
    var off = 0
    while (off < b.length) {
      val n = math.min(chunkSize, b.length - off)
      out.write(s"${n.toHexString}\r\n".getBytes(StandardCharsets.US_ASCII))
      out.write(b, off, n)
      out.write(Crlf)
      off += n
    }
    out.write("0\r\n\r\n".getBytes(StandardCharsets.US_ASCII))
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

  // ---- HTTP payload split + body decoding (response records) ----

  /** A split-and-decoded HTTP message. `transferEncoding` /
    * `contentEncoding` are the ORIGINAL header values, verbatim ("" when
    * absent) — provenance, not residual state. The decode contract that
    * resolves the ambiguity: `chunked` transfer-coding and `gzip`/
    * `x-gzip`/`deflate`/`identity` content-codings — alone or as a
    * multi-coding list of only those — are ALWAYS undone (malformed
    * framing refuses loudly — see [[decodeHttp]]), so those values in
    * the fields mean "was encoded on the wire, `body` is decoded"; a
    * coding with no codec here (`br`, `zstd`, alone or anywhere in a
    * list) passes the body through untouched, so such a value means
    * "`body` is still encoded" and downstream gates can filter on it
    * visibly instead of scoring compressed bytes as text.
    */
  final case class HttpParts(
      status: Int, contentType: String, transferEncoding: String,
      contentEncoding: String, body: Array[Byte])

  /** Split an `application/http` payload into status, content type, and a
    * DECODED body — the three wire layers a real crawl response stacks,
    * undone in reverse wire order (RFC 9112):
    *
    *  1. `Transfer-Encoding: chunked` — de-chunked (hex chunk-size lines,
    *     optional chunk extensions, terminal 0-chunk, trailer section).
    *     Malformed chunk framing (non-hex size, truncated data, missing
    *     CRLF) REFUSES with context — resynchronizing silently truncates
    *     crawl data, the wrong-looking-right failure this layer exists to
    *     prevent.
    *  2. `Content-Encoding: gzip | x-gzip | deflate` — inflated (JDK
    *     `GZIPInputStream` / `Inflater`; `deflate` tries zlib-wrapped
    *     first, then raw — the dual every HTTP client implements because
    *     real servers ship both). Multi-coding LISTS (`gzip, identity`)
    *     are undone right-to-left (RFC 9110 §8.4 list order) when every
    *     member has a codec. Corrupt streams refuse loudly. A coding (or
    *     list member) this engine has no codec for (`br`, `zstd`) passes
    *     the body through raw with the full header named in
    *     [[HttpParts.contentEncoding]] — visible, never silently
    *     mis-scored, never half-decoded.
    *  3. Charset — a `text/…` content type with an EXPLICIT non-UTF-8
    *     `charset=` parameter is transcoded to UTF-8 (undecodable bytes →
    *     U+FFFD, visible downstream), so every consumer reads `body` as
    *     UTF-8 without re-parsing headers. Binary types and absent/unknown
    *     charset labels are left untouched; step 3 is skipped entirely
    *     when step 2 could not decode (transcoding compressed bytes would
    *     corrupt them).
    *
    * A payload that is not an HTTP message comes back as
    * `HttpParts(0, "", "", "", payload)` — non-http record types
    * (warcinfo, metadata) carry their payload through unchanged.
    */
  def decodeHttp(payload: Array[Byte]): HttpParts = {
    val sep = indexOfDoubleCrlf(payload)
    if (sep < 0) return HttpParts(0, "", "", "", payload)
    val head = new String(payload, 0, sep, StandardCharsets.US_ASCII)
    val lines = head.split("\r\n")
    if (lines.isEmpty || !lines(0).startsWith("HTTP/"))
      return HttpParts(0, "", "", "", payload)
    val status = lines(0).split(" ")
      .drop(1).headOption.flatMap(_.toIntOption).getOrElse(0)
    def header(name: String): String = lines.drop(1).collectFirst {
      case l if l.toLowerCase.startsWith(name + ":") =>
        l.substring(l.indexOf(':') + 1).trim
    }.getOrElse("")
    val ct = header("content-type")
    val te = header("transfer-encoding")
    val ce = header("content-encoding")
    var body = java.util.Arrays.copyOfRange(payload, sep + 4, payload.length)
    if (te.toLowerCase.split(",").map(_.trim).contains("chunked"))
      body = deChunk(body)
    // Content-Encoding is a LIST applied left-to-right on the wire
    // (RFC 9110 §8.4) — undo right-to-left, but only when EVERY member
    // has a codec: partially decoding "br, gzip" would leave bytes that
    // are neither the wire form nor the content, with no name for what
    // they are. All-or-nothing keeps the HttpParts contract two-valued.
    val codings = ce.toLowerCase.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val decodable = codings.forall {
      case "identity" | "gzip" | "x-gzip" | "deflate" => true
      case _ => false // br / zstd / unknown: pass through, named in contentEncoding
    }
    val decoded = decodable && {
      codings.reverse.foreach {
        case "identity"        => ()
        case "gzip" | "x-gzip" => body = gunzip(body, "Content-Encoding: gzip body")
        case "deflate"         => body = inflateHttp(body)
        case other             => throw new IllegalStateException(s"unreachable: $other")
      }
      true
    }
    if (decoded && ct.toLowerCase.startsWith("text/"))
      declaredCharset(ct).foreach { cs =>
        if (cs != StandardCharsets.UTF_8 && cs != StandardCharsets.US_ASCII) {
          val dec = cs.newDecoder()
            .onMalformedInput(CodingErrorAction.REPLACE)
            .onUnmappableCharacter(CodingErrorAction.REPLACE)
          body = dec.decode(java.nio.ByteBuffer.wrap(body)).toString
            .getBytes(StandardCharsets.UTF_8)
        }
      }
    HttpParts(status, ct, te, ce, body)
  }

  /** Back-compat tuple form of [[decodeHttp]]: (status, contentType,
    * decoded body).
    */
  def splitHttp(payload: Array[Byte]): (Int, String, Array[Byte]) = {
    val h = decodeHttp(payload)
    (h.status, h.contentType, h.body)
  }

  /** The `charset=` parameter of a Content-Type header, resolved to a JVM
    * charset; None when absent or when the label is unknown to the JVM
    * (garbage labels are common on the real web — an unknown label leaves
    * the bytes untouched rather than guessing).
    */
  private[sources] def declaredCharset(contentType: String): Option[Charset] = {
    val m = CharsetParam.findFirstMatchIn(contentType)
    m.map(_.group(1).trim.stripPrefix("\"").stripSuffix("\"")).flatMap { label =>
      try if (Charset.isSupported(label)) Some(Charset.forName(label)) else None
      catch { case _: IllegalArgumentException => None }
    }
  }

  private val CharsetParam =
    """(?i);\s*charset\s*=\s*("[^"]*"|[^;\s]+)""".r

  /** Undo `Transfer-Encoding: chunked` (RFC 9112 §7.1). Refuses loudly on
    * malformed framing; tolerates a missing final CRLF after the terminal
    * 0-chunk at end-of-payload (common in truncated-at-capture records)
    * but never mid-stream corruption.
    */
  private[sources] def deChunk(b: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(b.length)
    var i = 0
    def readLine(ctx: String): String = {
      var j = i
      while (j + 1 < b.length && !(b(j) == '\r' && b(j + 1) == '\n')) j += 1
      require(j + 1 < b.length,
        s"malformed chunked body: unterminated $ctx at byte $i of ${b.length}")
      val s = new String(b, i, j - i, StandardCharsets.US_ASCII)
      i = j + 2
      s
    }
    var done = false
    while (!done) {
      val line = readLine("chunk-size line")
      val sizeStr = line.takeWhile(c => c != ';').trim // extensions after ';' ignored
      require(sizeStr.nonEmpty && sizeStr.length <= 8 &&
        sizeStr.forall(c => Character.digit(c, 16) >= 0),
        s"malformed chunked body: bad chunk size '${line.take(32)}' at byte $i")
      val n = java.lang.Long.parseLong(sizeStr, 16)
      if (n == 0L) {
        // trailer section: header lines until a blank line (or end of payload)
        var t = if (i >= b.length) "" else readLine("trailer line")
        while (t.nonEmpty) t = if (i >= b.length) "" else readLine("trailer line")
        done = true
      } else {
        require(i + n <= b.length,
          s"malformed chunked body: chunk of $n bytes truncated at ${b.length - i} available")
        out.write(b, i, n.toInt)
        i += n.toInt
        require(i + 2 <= b.length && b(i) == '\r' && b(i + 1) == '\n',
          s"malformed chunked body: missing CRLF after chunk data at byte $i")
        i += 2
      }
    }
    out.toByteArray
  }

  private def gunzip(b: Array[Byte], what: String): Array[Byte] =
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(b))
      val out = new ByteArrayOutputStream(b.length * 4)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } catch {
      case e: java.io.IOException => throw new IllegalArgumentException(
        s"malformed $what (${b.length} bytes): ${e.getMessage}", e)
    }

  /** `Content-Encoding: deflate`: zlib-wrapped per RFC 9110, but raw
    * deflate in the wild — try zlib first, raw second, refuse if neither
    * parses.
    */
  private def inflateHttp(b: Array[Byte]): Array[Byte] = {
    def run(nowrap: Boolean): Array[Byte] = {
      val inf = new Inflater(nowrap)
      try {
        inf.setInput(b)
        val out = new ByteArrayOutputStream(b.length * 4)
        val buf = new Array[Byte](8192)
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n == 0) {
            if (inf.needsDictionary()) throw new DataFormatException("preset dictionary required")
            if (inf.needsInput()) throw new DataFormatException("truncated deflate stream")
          }
          out.write(buf, 0, n)
        }
        out.toByteArray
      } finally inf.end()
    }
    try run(false) catch {
      case _: DataFormatException =>
        try run(true) catch {
          case e: DataFormatException => throw new IllegalArgumentException(
            s"malformed Content-Encoding: deflate body (${b.length} bytes, " +
              s"neither zlib-wrapped nor raw): ${e.getMessage}", e)
        }
    }
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

  /** One parsed record row. `body` is the DECODED HTTP body for
    * `application/http` response records (de-chunked, gzip/deflate
    * inflated, text transcoded to UTF-8 — see [[WarcCodec.decodeHttp]]),
    * the raw payload otherwise; `http_status` is 0 for non-http records.
    * `http_transfer_encoding` / `http_content_encoding` are the verbatim
    * wire headers ("" when absent) — under the decode contract, a
    * `chunked`/`gzip`/`deflate` value means "was encoded, body is
    * decoded"; any other content-coding means "body is still encoded,
    * gate on this column".
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
      http_transfer_encoding: String,
      http_content_encoding: String,
      body: Array[Byte],
      payload_digest: String,
      warc_profile: String)

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

  /** WET-file reader (the Common Crawl *.warc.wet.gz convention): a WET
    * file is a plain WARC whose `conversion` records carry ALREADY-
    * EXTRACTED text as their payload (`Content-Type: text/plain`, no HTTP
    * envelope) — the input most pipeline builds actually start from, one
    * step downstream of the raw crawl. Rows: (warc_file, record_idx, url,
    * warc_date, text) for conversion records only (`warcinfo` headers and
    * any other record types are metadata, not corpus). Text decodes as
    * UTF-8 — the WET convention; WET extractors emit UTF-8 regardless of
    * the page's original charset. Same streaming per-file parse and
    * one-task-per-file scale shape as [[read]].
    */
  def readWet(spark: SparkSession, path: String, minPartitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.functions.{col, decode}
    read(spark, path, minPartitions)
      .filter(col("warc_type") === "conversion")
      .select(col("warc_file"), col("record_idx"), col("url"),
        col("warc_date"), decode(col("body"), "UTF-8").as("text"))
  }

  /** The JSON envelope path a WAT metadata record carries its extracted
    * out-links under (the Common Crawl WAT layout: `Envelope` →
    * `Payload-Metadata` → `HTTP-Response-Metadata` → `HTML-Metadata` →
    * `Links`, each link a `{path, url}` object).
    */
  private val watSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    def st(fs: (String, DataType)*): StructType =
      StructType(fs.map { case (n, t) => StructField(n, t) })
    st("Envelope" -> st(
      "Payload-Metadata" -> st(
        "HTTP-Response-Metadata" -> st(
          "HTML-Metadata" -> st(
            "Links" -> ArrayType(st(
              "path" -> StringType, "url" -> StringType)))))))
  }

  /** WAT ingest — the third Common Crawl member next to WARC ([[read]],
    * q110) and WET ([[readWet]], q143): `metadata` records whose JSON
    * envelope carries the crawler's extracted per-page metadata, most
    * usefully the out-link list — the natural feeder for a host-level
    * link graph ([[graft.operators.ConnectedComponents]], PageRank-style
    * quality priors; q148). Rows: (warc_file, record_idx, url,
    * warc_date, links) with `links` the envelope's `Links[].url` array
    * (null when the record carries no HTML metadata — non-HTML
    * responses, warcinfo-adjacent records); the parse is one
    * `from_json` over the schema above, map-side in the record scan.
    */
  def readWat(spark: SparkSession, path: String, minPartitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.functions.{col, decode, from_json}
    read(spark, path, minPartitions)
      .filter(col("warc_type") === "metadata")
      .select(col("warc_file"), col("record_idx"), col("url"), col("warc_date"),
        from_json(decode(col("body"), "UTF-8"), watSchema)
          .getField("Envelope").getField("Payload-Metadata")
          .getField("HTTP-Response-Metadata").getField("HTML-Metadata")
          .getField("Links").getField("url").as("links"))
  }

  /** Record → row projection shared by the batch reader and the streaming
    * ingest ([[graft.streaming.CrawlStream]]) so both land the identical
    * shape.
    */
  private[graft] def toRows(
      file: String, recs: Iterator[WarcCodec.WarcRecord]): Iterator[WarcRow] =
    recs.zipWithIndex.map { case (r, i) =>
      val h =
        if (r.contentType.toLowerCase.startsWith("application/http"))
          WarcCodec.decodeHttp(r.payload)
        else WarcCodec.HttpParts(0, "", "", "", r.payload)
      def hdr(name: String): String = r.headers.iterator.collectFirst {
        case (k, v) if k.equalsIgnoreCase(name) => v }.getOrElse("")
      WarcRow(file, i.toLong, r.warcType, r.targetUri, r.date,
        r.contentType, h.status, h.contentType,
        h.transferEncoding, h.contentEncoding, h.body,
        hdr("WARC-Payload-Digest"), hdr("WARC-Profile"))
    }

  /** Resolve `revisit` records against their originals — the Common Crawl
    * crawl-level dedup semantics (WARC 1.1 §6.7.2, the
    * identical-payload-digest profile): when a fetch returns a payload
    * the crawler has already stored, it writes a body-LESS `revisit`
    * record carrying only the `WARC-Payload-Digest` of the stored copy.
    * A pipeline that drops revisits undercounts URL coverage; one that
    * keeps them without resolution trains on empty documents. This
    * resolves each revisit to the original's body.
    *
    * Output: every `response` row (is_revisit = 0, original_url = its own
    * url) plus every `revisit` row (is_revisit = 1) with `original_url` /
    * `body` taken from the digest-matching response; a dangling revisit
    * (digest never stored in this read — cross-crawl references) keeps a
    * NULL original_url and empty body, visible rather than dropped. When
    * several responses share a digest (the crawler stored the payload
    * more than once), the FIRST capture in (file, record_idx) order is
    * the canonical original — deterministic under any partitioning.
    *
    * Scale shape: one groupBy(digest) over responses (map-side combined
    * `min_by`), one shuffle join of revisits on digest — exactly the
    * access pattern of a real revisit-resolution pass; bodies ride only
    * the original side.
    */
  def resolveRevisits(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val origs = df
      .filter(col("warc_type") === "response" && col("payload_digest") =!= "")
      .groupBy(col("payload_digest"))
      .agg(min_by(
        struct(col("url"), col("body")),
        struct(col("warc_file"), col("record_idx"))).as("__o"))
      .select(col("payload_digest"),
        col("__o.url").as("__orig_url"), col("__o.body").as("__orig_body"))
    val keep = Seq("warc_file", "record_idx", "url", "warc_date",
      "payload_digest").map(col)
    val responses = df.filter(col("warc_type") === "response")
      .select(keep :+ lit(0L).as("is_revisit") :+
        col("url").as("original_url") :+ col("body").as("body"): _*)
    val revisits = df.filter(col("warc_type") === "revisit")
      .select(keep: _*)
      .join(origs, Seq("payload_digest"), "left")
      .select(keep :+ lit(1L).as("is_revisit") :+
        col("__orig_url").as("original_url") :+
        coalesce(col("__orig_body"), lit(Array.empty[Byte])).as("body"): _*)
    responses.unionByName(revisits)
  }
}
