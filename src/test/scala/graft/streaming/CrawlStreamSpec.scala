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

  test("incremental line dedup: stream == batch after every wave; a line crossing " +
      "the threshold re-gates PRIOR docs") {
    val warcDir = Files.createTempDirectory("crawl_ld_in_")
    val corpus = Files.createTempDirectory("crawl_ld_out_").resolve("corpus").toString
    val banner = (0 until 6).map(i => s"banner$i").mkString(" ")
    // one record = banner paragraph + a unique 70-token paragraph — each
    // extracted block is one LINE of main_text
    def bdoc(id: Int): WarcCodec.WarcRecord = {
      val body = (0 until 70).map(w => s"uniq${id}w$w").mkString(" ")
      val html = s"<html><body><p>$banner</p><p>$body</p></body></html>"
      WarcCodec.WarcRecord(
        "response", s"http://crawl.test/doc/$id", "2026-01-01T00:00:00Z",
        "application/http; msgtype=response",
        WarcCodec.httpResponsePayload(200, "OK", "text/html; charset=utf-8",
          html.getBytes(UTF_8)))
    }
    def drainLd(): Unit = {
      val q = CrawlStream.start(spark, warcDir.toString, corpus,
        gateMinTokens = 60, availableNow = true, lineDedupMinDocs = 3)
      q.awaitTermination(120000)
    }
    def cleanSet() = CrawlStream.cleanDocs(spark, corpus)
      .select("url", "clean_text", "n_kept", "n_dropped")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    def batchSet() = graft.functions.DedupFunctions.dedupBoilerplateLines(
        VersionedTable.read(spark, corpus), "url", "main_text", minDupDocs = 3)
      .select("url", "clean_text", "n_kept", "n_dropped")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet

    // wave 1: banner in two docs (below threshold 3) — everything kept
    land(warcDir, "w1.warc.gz", Seq(bdoc(1), bdoc(2)))
    drainLd()
    val c1 = cleanSet()
    assert(c1 == batchSet(), "wave 1: stream must equal the batch dedup")
    assert(c1.forall(d => d._2.contains("banner0") && d._3 == 2L && d._4 == 0L),
      s"below threshold the banner line survives: $c1")

    // wave 2: a third banner doc crosses the threshold — the PRIOR docs'
    // clean_text must lose the banner too, not just the new doc's
    land(warcDir, "w2.warc.gz", Seq(bdoc(3)))
    drainLd()
    val c2 = cleanSet()
    assert(c2 == batchSet(), "wave 2: stream must equal the batch dedup")
    assert(c2.size == 3)
    assert(c2.forall(d => !d._2.contains("banner0") && d._3 == 1L && d._4 == 1L),
      s"crossing the threshold must strip the banner from every doc: $c2")

    // replay: nothing new landed → state unchanged
    drainLd()
    assert(cleanSet() == c2)
  }

  test("re-crawled urls count once per line; re-gating serves the LATEST version") {
    val warcDir = Files.createTempDirectory("crawl_rc_in_")
    val corpus = Files.createTempDirectory("crawl_rc_out_").resolve("corpus").toString
    val banner = (0 until 6).map(i => s"banner$i").mkString(" ")
    def bdoc(id: Int, ver: Int): WarcCodec.WarcRecord = {
      val body = (0 until 70).map(w => s"uniq${id}v${ver}w$w").mkString(" ")
      val html = s"<html><body><p>$banner</p><p>$body</p></body></html>"
      WarcCodec.WarcRecord(
        "response", s"http://crawl.test/doc/$id", "2026-01-01T00:00:00Z",
        "application/http; msgtype=response",
        WarcCodec.httpResponsePayload(200, "OK", "text/html; charset=utf-8",
          html.getBytes(UTF_8)))
    }
    def drainLd(): Unit = {
      val q = CrawlStream.start(spark, warcDir.toString, corpus,
        gateMinTokens = 60, availableNow = true, lineDedupMinDocs = 3)
      q.awaitTermination(120000)
    }
    def cleanMap() = CrawlStream.cleanDocs(spark, corpus)
      .select("url", "clean_text")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // the re-crawl-aware batch restatement: boiler set = countDistinct(url)
    // over the FULL accumulated history; clean = latest version per url
    // cleaned against that set
    def batchClean() = {
      val hist = VersionedTable.read(spark, corpus)
      val boiler = graft.functions.DedupFunctions
        .explodeLines(hist, "url", "main_text")
        .groupBy(col("__line")).agg(countDistinct(col("url")).as("__nd"))
        .filter(col("__nd") >= 3).select(col("__line"))
      val latest = hist.groupBy(col("url"))
        .agg(max_by(col("main_text"), col("ingest_batch")).as("main_text"))
      graft.functions.DedupFunctions
        .cleanAgainstBoilerplate(latest, "url", "main_text", boiler)
        .filter(col("n_kept") > 0)
        .select("url", "clean_text")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    }

    // wave 1: banner in docs 1 and 2 — count 2, below threshold 3
    land(warcDir, "w1.warc.gz", Seq(bdoc(1, 1), bdoc(2, 1)))
    drainLd()
    // wave 2: RE-CRAWL doc 1 (new body, same banner). A double-counting
    // maintainer would now see banner count 3 and strip it; the correct
    // countDistinct semantics keep it at 2 — banner survives everywhere
    land(warcDir, "w2.warc.gz", Seq(bdoc(1, 2)))
    drainLd()
    val c2 = cleanMap()
    assert(c2 == batchClean(), "wave 2: stream must equal the re-crawl-aware batch")
    assert(c2("http://crawl.test/doc/1").contains("banner0"),
      s"banner must survive at count 2 (re-crawl must not double-count): $c2")
    assert(c2("http://crawl.test/doc/1").contains("uniq1v2w0") &&
      !c2("http://crawl.test/doc/1").contains("uniq1v1w0"),
      "the clean table must serve the re-crawled (latest) version")

    // wave 3: doc 3 brings the banner to distinct-url count 3 — crossed;
    // every doc's clean text loses it, and the PRIOR doc 1 must be
    // re-gated on its LATEST (v2) text, not the v1 history row
    land(warcDir, "w3.warc.gz", Seq(bdoc(3, 1)))
    drainLd()
    val c3 = cleanMap()
    assert(c3 == batchClean(), "wave 3: stream must equal the re-crawl-aware batch")
    assert(c3.values.forall(!_.contains("banner0")),
      s"crossing the threshold must strip the banner everywhere: $c3")
    assert(c3("http://crawl.test/doc/1").contains("uniq1v2w0"),
      "re-gating a re-crawled url must clean its latest version")
    // replay: state unchanged
    drainLd()
    assert(cleanMap() == c3)
  }

  test("a wave carrying the same url twice refuses loudly") {
    val warcDir = Files.createTempDirectory("crawl_dup_in_")
    val corpus = Files.createTempDirectory("crawl_dup_out_").resolve("corpus").toString
    val banner = (0 until 6).map(i => s"banner$i").mkString(" ")
    def doc(body: String): WarcCodec.WarcRecord = {
      val html = s"<html><body><p>$banner</p><p>$body</p></body></html>"
      WarcCodec.WarcRecord(
        "response", "http://crawl.test/doc/9", "2026-01-01T00:00:00Z",
        "application/http; msgtype=response",
        WarcCodec.httpResponsePayload(200, "OK", "text/html; charset=utf-8",
          html.getBytes(UTF_8)))
    }
    land(warcDir, "w1.warc.gz",
      Seq(doc((0 until 70).map(w => s"a$w").mkString(" ")),
        doc((0 until 70).map(w => s"b$w").mkString(" "))))
    val q = CrawlStream.start(spark, warcDir.toString, corpus,
      gateMinTokens = 60, availableNow = true, lineDedupMinDocs = 3)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(120000)
    }
    assert(e.getMessage.contains("more than once") ||
      Option(e.getCause).exists(_.getMessage.contains("more than once")))
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

  test("migration: a pre-ingest_batch corpus continues (old rows read as wave -1)") {
    import spark.implicits._
    val corpus = Files.createTempDirectory("crawl_mig_").resolve("corpus").toString
    val banner = (0 until 6).map(i => s"mig$i").mkString(" ")
    def row(id: Int) = {
      val body = (0 until 70).map(w => s"migu${id}w$w").mkString(" ")
      (s"http://crawl.test/doc/$id", banner + "\n" + body)
    }
    // wave 0 in the PRE-MIGRATION corpus shape: no ingest_batch column
    val w0 = Seq(row(1), row(2)).toDF("url", "main_text")
    VersionedTable.append(corpus, Some(0L))(dir => w0.write.parquet(dir))
    CrawlStream.maintainLineDedup(spark, corpus, w0, 0L, minDupDocs = 3)
    // wave 1 post-migration: the banner crosses the threshold, so the
    // re-gate must read the OLD corpus rows — before the fallback this
    // threw AnalysisException (missing column) on a continuing stream
    val w1 = Seq(row(3)).toDF("url", "main_text")
    VersionedTable.append(corpus, Some(1L))(dir =>
      w1.withColumn("ingest_batch", lit(1L)).write.parquet(dir))
    CrawlStream.maintainLineDedup(spark, corpus, w1, 1L, minDupDocs = 3)
    val clean = CrawlStream.cleanDocs(spark, corpus)
      .select("url", "clean_text").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(clean.size == 3)
    assert(clean.values.forall(!_.contains("mig0")),
      s"crossing the threshold must strip the banner from pre-migration docs too: $clean")
  }
}
