package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.SparkSpec
import graft.sources.{WarcCodec, WarcIO}
import graft.storage.VersionedTable
import org.apache.spark.sql.functions._

class CrawlStreamSpec extends SparkSpec {

  /** One response record; `words` controls whether the gate accepts. */
  private def rec(id: Int, words: Int): WarcCodec.WarcRecord = {
    val body = (0 until words).map(w => s"word$w").mkString(" ")
    val html = s"<html><body><div><a href='/'>Home</a> <a href='/a'>About</a></div>" +
      s"<p>$body</p><footer><a href='/t'>Terms</a></footer></body></html>"
    WarcCodec.WarcRecord(
      "response", s"http://crawl.test/doc/$id", "2026-01-01T00:00:00Z",
      "application/http; msgtype=response",
      WarcCodec.httpResponsePayload(200, "OK", "text/html; charset=utf-8",
        html.getBytes(UTF_8)))
  }

  private def land(dir: java.nio.file.Path, name: String, recs: Seq[WarcCodec.WarcRecord]): Unit = {
    Files.write(dir.resolve(name), WarcCodec.encodeGzip(recs))
    ()
  }

  private def drain(warcDir: String, corpus: String): Unit = {
    val q = CrawlStream.start(spark, warcDir, corpus,
      gateMinTokens = 60, availableNow = true)
    q.awaitTermination(120000)
  }

  private def tableUrls(corpus: String): Set[String] =
    VersionedTable.read(spark, corpus).select("url")
      .collect().map(_.getString(0)).toSet

  test("stream ingest == batch pipeline on the same files; gate filters short docs") {
    val warcDir = Files.createTempDirectory("crawl_in_")
    val corpus = Files.createTempDirectory("crawl_out_").resolve("corpus").toString
    land(warcDir, "a.warc.gz", Seq(rec(1, 80), rec(2, 10), rec(3, 64)))
    land(warcDir, "b.warc.gz", Seq(rec(4, 61), rec(5, 59)))
    drain(warcDir.toString, corpus)
    val streamed = VersionedTable.read(spark, corpus)
      .select("url", "main_text", "n_tokens")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val batch = CrawlStream.extractAccepted(
        WarcIO.read(spark, warcDir.toString + "/*.warc.gz"), gateMinTokens = 60)
      .select("url", "main_text", "n_tokens")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.map(_._1) ==
      Set("http://crawl.test/doc/1", "http://crawl.test/doc/3", "http://crawl.test/doc/4"))
    // the gate saw the EXTRACTED text: boilerplate links don't count as tokens
    assert(streamed.forall(_._3 >= 60))
  }

  test("late-landing files ingest incrementally; replay appends nothing") {
    val warcDir = Files.createTempDirectory("crawl_in2_")
    val corpus = Files.createTempDirectory("crawl_out2_").resolve("corpus").toString
    land(warcDir, "w1.warc.gz", Seq(rec(10, 70), rec(11, 70)))
    drain(warcDir.toString, corpus)
    assert(tableUrls(corpus) ==
      Set("http://crawl.test/doc/10", "http://crawl.test/doc/11"))
    val v1 = VersionedTable.readManifest(corpus).get.version
    // wave 2: only the new file's docs append
    land(warcDir, "w2.warc.gz", Seq(rec(12, 70)))
    drain(warcDir.toString, corpus)
    assert(tableUrls(corpus) == Set(
      "http://crawl.test/doc/10", "http://crawl.test/doc/11", "http://crawl.test/doc/12"))
    assert(VersionedTable.read(spark, corpus).count() == 3) // no duplicates
    // replay: nothing new landed → no rows and no new table version
    val v2 = VersionedTable.readManifest(corpus).get.version
    assert(v2 > v1)
    drain(warcDir.toString, corpus)
    assert(VersionedTable.read(spark, corpus).count() == 3)
  }

  test("non-html and non-200 responses never enter the corpus") {
    val warcDir = Files.createTempDirectory("crawl_in3_")
    val corpus = Files.createTempDirectory("crawl_out3_").resolve("corpus").toString
    val png = WarcCodec.WarcRecord(
      "response", "http://crawl.test/img/1", "2026-01-01T00:00:00Z",
      "application/http; msgtype=response",
      WarcCodec.httpResponsePayload(200, "OK", "image/png", Array[Byte](1, 2, 3)))
    val notFound = WarcCodec.WarcRecord(
      "response", "http://crawl.test/doc/404", "2026-01-01T00:00:00Z",
      "application/http; msgtype=response",
      WarcCodec.httpResponsePayload(404, "Not Found", "text/html",
        ("<p>" + (0 until 80).map(i => s"w$i").mkString(" ") + "</p>").getBytes(UTF_8)))
    val meta = WarcCodec.WarcRecord(
      "warcinfo", "", "2026-01-01T00:00:00Z", "application/warc-fields",
      "software: graft".getBytes(UTF_8))
    land(warcDir, "mixed.warc.gz", Seq(png, notFound, meta, rec(20, 70)))
    drain(warcDir.toString, corpus)
    assert(tableUrls(corpus) == Set("http://crawl.test/doc/20"))
  }
}
