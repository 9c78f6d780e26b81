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
}
