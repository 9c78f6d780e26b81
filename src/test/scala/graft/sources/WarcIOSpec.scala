package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarcIOSpec extends SparkSpec {

  private def rec(i: Int, body: String = ""): WarcCodec.WarcRecord = {
    val payload =
      if (body.isEmpty) s"payload-$i".getBytes(UTF_8)
      else WarcCodec.httpResponsePayload(200, "OK", "text/html", body.getBytes(UTF_8))
    WarcCodec.WarcRecord(
      warcType = if (body.isEmpty) "metadata" else "response",
      targetUri = s"http://example.org/page/$i",
      date = "2026-01-01T00:00:00Z",
      contentType =
        if (body.isEmpty) "application/warc-fields"
        else "application/http; msgtype=response",
      payload = payload)
  }

  test("plain encode/parse round-trips every field and payload byte") {
    val recs = (0 until 5).map(i => rec(i, if (i % 2 == 0) s"<p>body $i</p>" else ""))
    val parsed = WarcCodec.parse(WarcCodec.encodePlain(recs))
    assert(parsed.size == 5)
    parsed.zip(recs).foreach { case (p, r) =>
      assert(p.warcType == r.warcType)
      assert(p.targetUri == r.targetUri)
      assert(p.date == r.date)
      assert(p.contentType == r.contentType)
      assert(p.payload.toSeq == r.payload.toSeq)
    }
  }

  test("gzip-per-record members (the Common-Crawl convention) parse as a stream") {
    val recs = (0 until 7).map(i => rec(i, s"body $i"))
    val gz = WarcCodec.encodeGzip(recs)
    assert(gz(0) == 0x1f.toByte && gz(1) == 0x8b.toByte)
    val parsed = WarcCodec.parse(gz)
    assert(parsed.size == 7)
    assert(parsed.map(_.targetUri) == recs.map(_.targetUri))
  }

  test("binary payloads with CRLF-looking bytes survive length framing") {
    // payload containing \r\n\r\n and a fake WARC/1.0 line: only
    // Content-Length framing (never resync-by-pattern) parses this right
    val tricky = "WARC/1.0\r\n\r\nfake: header\r\n\r\n".getBytes(UTF_8)
    val r = WarcCodec.WarcRecord("resource", "http://x/y", "2026-01-01T00:00:00Z",
      "application/octet-stream", tricky)
    val parsed = WarcCodec.parse(WarcCodec.encodePlain(Seq(r, rec(1))))
    assert(parsed.size == 2)
    assert(parsed.head.payload.toSeq == tricky.toSeq)
    assert(parsed(1).targetUri == "http://example.org/page/1")
  }

  test("truncated payload refuses instead of resynchronizing") {
    val full = WarcCodec.encodeRecord(rec(0, "some body"))
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length - 20)
    val e = intercept[Exception](WarcCodec.parse(cut))
    assert(e.getMessage.contains("truncated"))
  }

  test("missing Content-Length and garbage leaders refuse loudly") {
    val noLen = "WARC/1.0\r\nWARC-Type: response\r\n\r\n".getBytes(UTF_8)
    assert(intercept[IllegalArgumentException](WarcCodec.parse(noLen))
      .getMessage.contains("Content-Length"))
    val garbage = "HTTP/1.1 200 OK\r\n\r\n".getBytes(UTF_8)
    assert(intercept[IllegalArgumentException](WarcCodec.parse(garbage))
      .getMessage.contains("version line"))
  }

  test("splitHttp extracts status, content type, and exact body bytes") {
    val (st, ct, body) = WarcCodec.splitHttp(
      WarcCodec.httpResponsePayload(404, "Not Found", "text/plain", "nope".getBytes(UTF_8)))
    assert(st == 404 && ct == "text/plain" && new String(body, UTF_8) == "nope")
    // non-http payload passes through with status 0
    val raw = "just bytes".getBytes(UTF_8)
    val (st2, ct2, body2) = WarcCodec.splitHttp(raw)
    assert(st2 == 0 && ct2 == "" && body2.toSeq == raw.toSeq)
  }

  test("WarcIO.read lands one row per record with HTTP pre-split, over mixed files") {
    val dir = Files.createTempDirectory("graft_warcio_")
    // one gzipped file, one plain file — the reader auto-detects per file
    Files.write(dir.resolve("a.warc.gz"),
      WarcCodec.encodeGzip((0 until 4).map(i => rec(i, s"<p>alpha $i</p>"))))
    Files.write(dir.resolve("b.warc"),
      WarcCodec.encodePlain((10 until 13).map(i => rec(i))))
    val df = WarcIO.read(spark, dir.toString + "/*.warc*").cache()
    assert(df.count() == 7)
    val responses = df.filter(col("warc_type") === "response")
    assert(responses.count() == 4)
    assert(responses.select("http_status").distinct().collect().map(_.getInt(0)).toSeq == Seq(200))
    val bodies = responses
      .select(col("url"), expr("decode(body, 'UTF-8')").as("b"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(bodies("http://example.org/page/2") == "<p>alpha 2</p>")
    val meta = df.filter(col("warc_type") === "metadata")
    assert(meta.count() == 3)
    assert(meta.select("http_status").distinct().collect().map(_.getInt(0)).toSeq == Seq(0))
    df.unpersist()
  }

  test("parse is streaming: records surface before the stream is exhausted") {
    // a lazily-failing stream: valid first record, then an error — the
    // iterator must yield record 0 without pre-reading the whole input
    val good = WarcCodec.encodeRecord(rec(0, "streamed"))
    val in = new java.io.SequenceInputStream(
      new java.io.ByteArrayInputStream(good),
      new java.io.InputStream {
        override def read(): Int = throw new java.io.IOException("late bytes")
      })
    val it = WarcCodec.parse(in)
    assert(it.hasNext)
    assert(it.next().targetUri == "http://example.org/page/0")
    intercept[java.io.IOException](it.hasNext)
  }

  // ---- HTTP body decoding (chunked / gzip / deflate / charset) ----

  test("chunked transfer-coding round-trips, including multi-chunk bodies") {
    val body = ("x" * 1234).getBytes(UTF_8)
    val payload = WarcCodec.httpResponsePayloadEncoded(
      200, "OK", "text/plain", body, chunked = true, chunkSize = 100)
    // the wire form must carry no Content-Length and a chunked marker
    val wire = new String(payload, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(wire.contains("Transfer-Encoding: chunked") && !wire.contains("Content-Length"))
    val h = WarcCodec.decodeHttp(payload)
    assert(h.status == 200 && h.transferEncoding == "chunked")
    assert(h.body.toSeq == body.toSeq)
  }

  test("chunk extensions and trailer headers are tolerated") {
    val framed = ("5;ext=1\r\nhello\r\n" +
      "6\r\n world\r\n" +
      "0\r\nX-Trailer: t\r\n\r\n").getBytes(UTF_8)
    assert(new String(WarcCodec.deChunk(framed), UTF_8) == "hello world")
    // terminal 0-chunk at end of payload without final CRLF (truncated
    // capture) is tolerated too
    val noFinal = "3\r\nabc\r\n0\r\n".getBytes(UTF_8)
    assert(new String(WarcCodec.deChunk(noFinal), UTF_8) == "abc")
  }

  test("malformed chunked framing refuses loudly, never resynchronizes") {
    // truncated chunk data
    val truncated = "10\r\nonly-7-b".getBytes(UTF_8)
    assert(intercept[IllegalArgumentException](WarcCodec.deChunk(truncated))
      .getMessage.contains("truncated"))
    // non-hex chunk size
    val badSize = "zz\r\nhello\r\n0\r\n\r\n".getBytes(UTF_8)
    assert(intercept[IllegalArgumentException](WarcCodec.deChunk(badSize))
      .getMessage.contains("bad chunk size"))
    // missing CRLF after chunk data
    val noCrlf = "3\r\nabcXX0\r\n\r\n".getBytes(UTF_8)
    assert(intercept[IllegalArgumentException](WarcCodec.deChunk(noCrlf))
      .getMessage.contains("missing CRLF"))
  }

  test("gzip content-coding inflates; corrupt gzip refuses loudly") {
    val body = "inflate me please, twelve tokens or so".getBytes(UTF_8)
    val payload = WarcCodec.httpResponsePayloadEncoded(
      200, "OK", "text/plain", body, gzipBody = true)
    val h = WarcCodec.decodeHttp(payload)
    assert(h.contentEncoding == "gzip" && h.body.toSeq == body.toSeq)
    // flip a byte in the deflate stream -> loud refusal
    val gz = WarcCodec.gzipOnce(body)
    gz(gz.length / 2) = (gz(gz.length / 2) ^ 0x5a).toByte
    val bad = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
      s"Content-Encoding: gzip\r\nContent-Length: ${gz.length}\r\n\r\n").getBytes(UTF_8) ++ gz
    assert(intercept[IllegalArgumentException](WarcCodec.decodeHttp(bad))
      .getMessage.contains("malformed"))
  }

  test("gzip + chunked compose in wire order and decode in reverse") {
    val body = ("token " * 40).getBytes(UTF_8)
    val payload = WarcCodec.httpResponsePayloadEncoded(
      200, "OK", "text/plain", body, gzipBody = true, chunked = true, chunkSize = 37)
    val h = WarcCodec.decodeHttp(payload)
    assert(h.transferEncoding == "chunked" && h.contentEncoding == "gzip")
    assert(h.body.toSeq == body.toSeq)
  }

  test("deflate content-coding: zlib-wrapped and raw both inflate") {
    val body = "deflated body bytes".getBytes(UTF_8)
    def payloadWith(enc: Array[Byte]): Array[Byte] =
      ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
        s"Content-Encoding: deflate\r\nContent-Length: ${enc.length}\r\n\r\n")
        .getBytes(UTF_8) ++ enc
    val zlib = {
      val d = new java.util.zip.Deflater()
      d.setInput(body); d.finish()
      val buf = new Array[Byte](1024); val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    val raw = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(body); d.finish()
      val buf = new Array[Byte](1024); val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    assert(WarcCodec.decodeHttp(payloadWith(zlib)).body.toSeq == body.toSeq)
    assert(WarcCodec.decodeHttp(payloadWith(raw)).body.toSeq == body.toSeq)
    val garbage = Array.fill[Byte](64)(0x3c)
    assert(intercept[IllegalArgumentException](WarcCodec.decodeHttp(payloadWith(garbage)))
      .getMessage.contains("deflate"))
  }

  test("declared non-UTF-8 charset on text types transcodes to UTF-8") {
    val text = "Résumé nº7 — ein schöner Text"
    val iso = text.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    // é/º/ö are single bytes in ISO-8859-1; — (U+2014) is unmappable and
    // must have been refused by getBytes... it maps to '?' silently, so
    // use only Latin-1-safe chars in the fixture text
    val safe = "Résumé nº7 - ein schöner Text"
    val isoSafe = safe.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(isoSafe.length == safe.length) // truly single-byte
    val payload = WarcCodec.httpResponsePayloadEncoded(
      200, "OK", "text/html; charset=iso-8859-1", isoSafe)
    val h = WarcCodec.decodeHttp(payload)
    assert(new String(h.body, UTF_8) == safe)
    // charset param also honored through gzip+chunked transport
    val stacked = WarcCodec.httpResponsePayloadEncoded(
      200, "OK", "text/html; charset=ISO-8859-1", isoSafe,
      gzipBody = true, chunked = true, chunkSize = 7)
    assert(new String(WarcCodec.decodeHttp(stacked).body, UTF_8) == safe)
    // binary types are never transcoded even with a charset param
    val bin = WarcCodec.httpResponsePayloadEncoded(
      200, "OK", "application/octet-stream; charset=iso-8859-1", isoSafe)
    assert(WarcCodec.decodeHttp(bin).body.toSeq == isoSafe.toSeq)
    // unknown charset labels leave bytes untouched (never guess)
    val unk = WarcCodec.httpResponsePayloadEncoded(
      200, "OK", "text/html; charset=x-not-a-charset", isoSafe)
    assert(WarcCodec.decodeHttp(unk).body.toSeq == isoSafe.toSeq)
    assert(WarcCodec.declaredCharset("text/html; charset=\"utf-8\"")
      .contains(java.nio.charset.StandardCharsets.UTF_8))
    assert(WarcCodec.declaredCharset("text/html").isEmpty)
  }

  test("unsupported content-codings pass through raw, named in the column") {
    val enc = Array[Byte](1, 2, 3, 4) // pretend-brotli bytes
    val payload = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
      s"Content-Encoding: br\r\nContent-Length: ${enc.length}\r\n\r\n").getBytes(UTF_8) ++ enc
    val h = WarcCodec.decodeHttp(payload)
    // body untouched (no brotli codec), coding visible, charset NOT applied
    assert(h.contentEncoding == "br" && h.body.toSeq == enc.toSeq)
  }

  test("multi-coding lists decode right-to-left; any unknown member keeps the whole list raw") {
    val body = "stacked codings body, long enough to actually compress".getBytes(UTF_8)
    // gzip, identity: applied left-to-right on the wire, undone in reverse
    val p1 = WarcCodec.httpResponsePayloadCodings(
      200, "OK", "text/plain; charset=utf-8", body, Seq("gzip", "identity"))
    val h1 = WarcCodec.decodeHttp(p1)
    assert(h1.contentEncoding == "gzip, identity" && h1.body.toSeq == body.toSeq)
    // identity, deflate — the other order, deflate outermost
    val p2 = WarcCodec.httpResponsePayloadCodings(
      200, "OK", "text/plain; charset=utf-8", body, Seq("identity", "deflate"))
    val h2 = WarcCodec.decodeHttp(p2)
    assert(h2.contentEncoding == "identity, deflate" && h2.body.toSeq == body.toSeq)
    // a REAL double-compression stack: deflate then gzip, both undone
    val p3 = WarcCodec.httpResponsePayloadCodings(
      200, "OK", "text/plain; charset=utf-8", body, Seq("deflate", "gzip"))
    assert(WarcCodec.decodeHttp(p3).body.toSeq == body.toSeq)
    // unknown member anywhere in the list: ALL-or-nothing — the wire
    // bytes (here gzip of the pretend-zstd bytes) pass through raw, so
    // the body is neither half-decoded nor silently text-scored
    val p4 = WarcCodec.httpResponsePayloadCodings(
      200, "OK", "text/plain; charset=utf-8", body, Seq("zstd", "gzip"))
    val h4 = WarcCodec.decodeHttp(p4)
    assert(h4.contentEncoding == "zstd, gzip")
    assert(h4.body.toSeq == WarcCodec.gzipOnce(body).toSeq,
      "wire bytes must come through untouched when any member lacks a codec")
  }

  test("readWet serves conversion records only, newline payloads byte-exact") {
    val dir = Files.createTempDirectory("graft_wet_spec_")
    val text = "line one\nline two\n\nline four with  spaces"
    val recs = Seq(
      WarcCodec.WarcRecord("warcinfo", "", "2026-01-01T00:00:00Z",
        "application/warc-fields", "software: test\r\n".getBytes(UTF_8)),
      WarcCodec.WarcRecord("conversion", "http://x/wet/1", "2026-01-01T00:00:00Z",
        "text/plain", text.getBytes(UTF_8)),
      WarcCodec.WarcRecord("metadata", "http://x/wet/1", "2026-01-01T00:00:00Z",
        "application/warc-fields", "links: 0\r\n".getBytes(UTF_8)))
    Files.write(dir.resolve("a.warc.wet.gz"), WarcCodec.encodeGzip(recs))
    val rows = WarcIO.readWet(spark, dir.toString + "/*.warc.wet.gz")
      .select("url", "text").collect()
    assert(rows.length == 1, "warcinfo and metadata records are not corpus")
    assert(rows.head.getString(0) == "http://x/wet/1")
    assert(rows.head.getString(1) == text, "payload with newlines must frame byte-exact")
  }

  test("readWat serves metadata records' link lists; malformed or linkless envelopes read null") {
    val dir = Files.createTempDirectory("graft_wat_spec_")
    val good = """{"Envelope":{"Payload-Metadata":{"HTTP-Response-Metadata":""" +
      """{"HTML-Metadata":{"Links":[{"path":"A@/href","url":"http://a.example/"},""" +
      """{"path":"IMG@/src","url":"http://b.example/i.png"}]}}}}}"""
    val noHtml = """{"Envelope":{"Payload-Metadata":{"HTTP-Response-Metadata":{}}}}"""
    val recs = Seq(
      WarcCodec.WarcRecord("warcinfo", "", "2026-01-01T00:00:00Z",
        "application/warc-fields", "software: test\r\n".getBytes(UTF_8)),
      WarcCodec.WarcRecord("metadata", "http://x/page/1", "2026-01-01T00:00:00Z",
        "application/json", good.getBytes(UTF_8)),
      WarcCodec.WarcRecord("metadata", "http://x/page/2", "2026-01-01T00:00:00Z",
        "application/json", noHtml.getBytes(UTF_8)),
      WarcCodec.WarcRecord("metadata", "http://x/page/3", "2026-01-01T00:00:00Z",
        "application/json", "not json at all".getBytes(UTF_8)),
      WarcCodec.WarcRecord("conversion", "http://x/page/4", "2026-01-01T00:00:00Z",
        "text/plain", "hello".getBytes(UTF_8)))
    Files.write(dir.resolve("a.warc.wat.gz"), WarcCodec.encodeGzip(recs))
    val rows = WarcIO.readWat(spark, dir.toString + "/*.warc.wat.gz")
      .select("url", "links").collect()
      .map(r => r.getString(0) -> Option(r.getSeq[String](1)).map(_.toList)).toMap
    assert(rows.keySet == Set("http://x/page/1", "http://x/page/2", "http://x/page/3"),
      "metadata records only — conversion and warcinfo are other members' business")
    assert(rows("http://x/page/1").contains(
      List("http://a.example/", "http://b.example/i.png")))
    assert(rows("http://x/page/2").isEmpty, "no HTML-Metadata: null links, not a crash")
    assert(rows("http://x/page/3").isEmpty, "unparseable envelope: null links, not a crash")
  }

  test("WarcIO.read surfaces encodings and decoded bodies end to end") {
    val dir = Files.createTempDirectory("graft_warcio_enc_")
    val body = "<p>alpha beta gamma delta epsilon zeta</p>"
    val recs = Seq(
      WarcCodec.WarcRecord("response", "http://x/plain", "2026-01-01T00:00:00Z",
        "application/http; msgtype=response",
        WarcCodec.httpResponsePayloadEncoded(200, "OK", "text/html", body.getBytes(UTF_8))),
      WarcCodec.WarcRecord("response", "http://x/chunkgz", "2026-01-01T00:00:00Z",
        "application/http; msgtype=response",
        WarcCodec.httpResponsePayloadEncoded(200, "OK", "text/html", body.getBytes(UTF_8),
          gzipBody = true, chunked = true, chunkSize = 11)))
    Files.write(dir.resolve("enc.warc.gz"), WarcCodec.encodeGzip(recs))
    val rows = WarcIO.read(spark, dir.toString + "/*.warc.gz")
      .select(col("url"), col("http_transfer_encoding"), col("http_content_encoding"),
        expr("decode(body, 'UTF-8')").as("b"))
      .collect().map(r => (r.getString(0), (r.getString(1), r.getString(2), r.getString(3)))).toMap
    assert(rows("http://x/plain") == (("", "", body)))
    assert(rows("http://x/chunkgz") == (("chunked", "gzip", body)))
  }

  test("extra headers (payload digest, profile) round-trip encode/parse") {
    val r = WarcCodec.WarcRecord("revisit", "http://x/r", "2026-01-01T00:00:00Z",
      "application/http; msgtype=response",
      "HTTP/1.1 200 OK\r\n\r\n".getBytes(UTF_8),
      headers = Map("WARC-Payload-Digest" -> "sha1:ABC",
        "WARC-Profile" -> "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest",
        "Content-Length" -> "999")) // writer-owned: must NOT override the real length
    val back = WarcCodec.parse(WarcCodec.encodePlain(Seq(r))).head
    assert(back.warcType == "revisit")
    assert(back.headers("WARC-Payload-Digest") == "sha1:ABC")
    assert(back.headers("WARC-Profile").endsWith("identical-payload-digest"))
    assert(back.payload.length == 19, "writer-owned Content-Length wins")
  }

  test("resolveRevisits: resolved body, dangling NULL, first capture canonical") {
    val dir = Files.createTempDirectory("graft_warcio_rv_")
    def resp(url: String, body: String, digest: String) =
      WarcCodec.WarcRecord("response", url, "2026-01-01T00:00:00Z",
        "application/http; msgtype=response",
        WarcCodec.httpResponsePayload(200, "OK", "text/plain", body.getBytes(UTF_8)),
        headers = Map("WARC-Payload-Digest" -> digest))
    def rev(url: String, digest: String) =
      WarcCodec.WarcRecord("revisit", url, "2026-01-02T00:00:00Z",
        "application/http; msgtype=response",
        "HTTP/1.1 200 OK\r\n\r\n".getBytes(UTF_8),
        headers = Map("WARC-Payload-Digest" -> digest))
    Files.write(dir.resolve("rv.warc.gz"), WarcCodec.encodeGzip(Seq(
      resp("http://x/a", "payload A", "sha1:AA"),
      resp("http://x/a-again", "payload A", "sha1:AA"), // duplicate capture
      rev("http://x/a-re", "sha1:AA"),
      rev("http://x/gone", "sha1:ZZ")))) // dangling
    val got = WarcIO.resolveRevisits(
        WarcIO.read(spark, dir.toString + "/*.warc.gz"))
      .select(col("url"), col("is_revisit"), col("original_url"),
        expr("decode(body, 'UTF-8')").as("b"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.getString(2)), r.getString(3))).toMap
    assert(got("http://x/a") == ((0L, Some("http://x/a"), "payload A")))
    assert(got("http://x/a-again") == ((0L, Some("http://x/a-again"), "payload A")))
    // revisit resolves to the FIRST capture of the digest, with its body
    assert(got("http://x/a-re") == ((1L, Some("http://x/a"), "payload A")))
    // dangling revisit kept visible, not dropped
    assert(got("http://x/gone") == ((1L, None, "")))
  }
}
