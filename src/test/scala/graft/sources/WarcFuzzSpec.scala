package graft.sources

import scala.util.Random

import graft.SparkSpec

/** Randomized round-trip property for the WARC codec: arbitrary binary
  * payloads (including CRLF runs, fake version lines, gzip magic bytes,
  * empty payloads) must survive encode → parse byte-exactly, in plain and
  * gzip-per-record framing, under a fixed seed (reproducible).
  */
class WarcFuzzSpec extends SparkSpec {

  private def randomRecord(rnd: Random, i: Int): WarcCodec.WarcRecord = {
    val payload = rnd.nextInt(5) match {
      case 0 => Array.emptyByteArray
      case 1 => // CRLF-heavy + fake record leader, the resync trap
        (("\r\n" * rnd.nextInt(4)) + "WARC/1.0\r\nContent-Length: 9999\r\n\r\n" +
          ("x" * rnd.nextInt(50))).getBytes("UTF-8")
      case 2 => // gzip magic inside a plain payload
        Array[Byte](0x1f.toByte, 0x8b.toByte) ++ Array.fill(rnd.nextInt(100))(rnd.nextInt.toByte)
      case _ => Array.fill(rnd.nextInt(2000))(rnd.nextInt.toByte)
    }
    val kinds = Seq("response", "request", "metadata", "resource", "warcinfo")
    WarcCodec.WarcRecord(
      warcType = kinds(rnd.nextInt(kinds.size)),
      targetUri = if (rnd.nextBoolean()) s"http://fuzz.example/$i/${rnd.nextInt(1000)}" else "",
      date = "2026-01-01T00:00:00Z",
      contentType = Seq("application/octet-stream", "text/plain",
        "application/http; msgtype=response")(rnd.nextInt(3)),
      payload = payload)
  }

  test("random records round-trip byte-exactly through plain and gzip framing") {
    val rnd = new Random(20260814L)
    for (trial <- 0 until 25) {
      val recs = (0 until 1 + rnd.nextInt(12)).map(i => randomRecord(rnd, i))
      val encoded =
        if (trial % 2 == 0) WarcCodec.encodePlain(recs) else WarcCodec.encodeGzip(recs)
      val parsed = WarcCodec.parse(encoded)
      assert(parsed.size == recs.size, s"trial $trial: record count")
      parsed.zip(recs).zipWithIndex.foreach { case ((p, r), k) =>
        assert(p.warcType == r.warcType, s"trial $trial rec $k type")
        assert(p.targetUri == r.targetUri, s"trial $trial rec $k uri")
        assert(p.contentType == r.contentType, s"trial $trial rec $k ct")
        assert(p.payload.toSeq == r.payload.toSeq, s"trial $trial rec $k payload")
      }
    }
  }

  test("every strict prefix of an encoding either parses fewer records or refuses — never invents one") {
    val rnd = new Random(7L)
    val recs = (0 until 4).map(i => randomRecord(rnd, i))
    val full = WarcCodec.encodePlain(recs)
    var invented = 0
    for (cut <- 1 until full.length) {
      val slice = java.util.Arrays.copyOfRange(full, 0, cut)
      val n = try WarcCodec.parse(slice).size
      catch { case _: Exception => -1 } // refusal is a legal outcome
      if (n > recs.size) invented += 1
      // a prefix can never yield MORE records than the full encoding
    }
    assert(invented == 0)
  }
}
