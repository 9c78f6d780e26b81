package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.TextFunctions
import graft.sources.{WarcCodec, WarcIO}
import graft.storage.VersionedTable

/** Continuous crawl ingest — the streaming composition of the crawl front
  * door: newly-landed WARC files stream in, each micro-batch is parsed
  * (the SAME `WarcCodec` the batch reader uses), HTTP-split, main-text
  * extracted, quality-gated, and the ACCEPTED documents append to a
  * governed corpus table through a batchId-guarded manifest commit — so a
  * replayed micro-batch cannot double-ingest a crawl file (exactly-once),
  * and downstream dedup/selection consume a clean append-only corpus.
  *
  * One transform ([[extractAccepted]]) serves both the streaming tick and
  * the batch backfill, so there is no drift between "what the backfill
  * built" and "what the stream appends" — the [[StreamingEnrich]] rule.
  *
  * Scale/trade note: the file-stream source materializes each WARC's
  * bytes as a row (`binaryFile` format), unlike the batch reader's
  * incremental `PortableDataStream` parse — bound per-tick memory with
  * `maxFilesPerTrigger` (the default here processes files a few at a
  * time). Parallelism is still one file per task, the crawl shape.
  */
object CrawlStream {

  /** Parse + extract + gate over a [[WarcIO.read]]-shaped record relation:
    * keep `application/http` 200-responses whose content type starts with
    * `text/html`, extract jusText-style main text, and accept docs with
    * at least `gateMinTokens` whitespace tokens. Returns
    * (warc_file, url, warc_date, main_text, n_tokens).
    *
    * `main_text` joins the accepted blocks with NEWLINES — one extracted
    * paragraph per line — so the downstream CCNet line dedup
    * ([[maintainLineDedup]]) operates on the paragraph structure the
    * extractor already recovered (a space join would collapse each doc to
    * one undeduplicable line).
    */
  def extractAccepted(records: DataFrame, gateMinTokens: Int = 60,
      minBlockTokens: Int = 5, maxLinkPct: Int = 30): DataFrame = {
    val main = array_join(TextFunctions.mainTextBlocks(
      decode(col("body"), "UTF-8"), minBlockTokens, maxLinkPct), "\n")
    records
      .filter(col("warc_type") === "response" && col("http_status") === 200 &&
        // HTTP header values carry arbitrary case in the wild (Text/HTML,
        // TEXT/html) — compare case-folded; warc_type values are lowercase
        // by the WARC spec's controlled vocabulary, so no fold needed there
        lower(col("http_content_type")).startsWith("text/html"))
      .withColumn("main_text", main)
      .withColumn("n_tokens", TextFunctions.tokenCount(col("main_text")).cast("long"))
      .filter(col("n_tokens") >= gateMinTokens)
      .select(col("warc_file"), col("url"), col("warc_date"),
        col("main_text"), col("n_tokens"))
  }

  /** Start the ingest stream over `warcDir` (files matching `*.warc*`),
    * appending accepted docs to the manifest table at `corpusPath`.
    * `availableNow = true` drains the currently-landed files and stops
    * (tests/backfill); otherwise ticks at `trigger`.
    *
    * `lineDedupMinDocs > 0` additionally maintains the CCNet boilerplate
    * line dedup INCREMENTALLY (see [[maintainLineDedup]]): per-line
    * distinct-doc counts accumulate in a keyed VersionedTable, and each
    * wave re-gates only the wave's docs plus the prior docs whose lines
    * just crossed the threshold — never the whole corpus. Read the result
    * with [[cleanDocs]]; stream ≡ batch
    * ([[graft.functions.DedupFunctions.dedupBoilerplateLines]] over the
    * accumulated corpus) is pinned by `CrawlStreamSpec`.
    */
  def start(
      spark: SparkSession,
      warcDir: String,
      corpusPath: String,
      gateMinTokens: Int = 60,
      maxFilesPerTrigger: Int = 16,
      trigger: String = "1 minute",
      availableNow: Boolean = false,
      lineDedupMinDocs: Int = 0): StreamingQuery = {
    import spark.implicits._
    // the binaryFile source's schema is FIXED by the format; the stream
    // API still demands it be stated (no inference pass on a stream)
    val binarySchema = org.apache.spark.sql.types.StructType.fromDDL(
      "path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY")
    val stream = spark.readStream.format("binaryFile")
      .schema(binarySchema)
      .option("pathGlobFilter", "*.warc*")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(warcDir)
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val records = batch.select(col("path"), col("content"))
          .as[(String, Array[Byte])]
          .flatMap { case (file, bytes) =>
            WarcIO.toRows(file, WarcCodec.parse(bytes).iterator)
          }
          .toDF()
        val accepted = extractAccepted(records, gateMinTokens)
        // batchId-guarded: a replayed batch is skipped, never re-appended.
        // ingest_batch stamps each row's wave so a re-crawled url's LATEST
        // version is identifiable in the append-only history
        VersionedTable.append(corpusPath, Some(bid))(
          dir => accepted.withColumn("ingest_batch", lit(bid)).write.parquet(dir))
        if (lineDedupMinDocs > 0)
          maintainLineDedup(spark, corpusPath, accepted, bid, lineDedupMinDocs)
        ()
      }
      .option("checkpointLocation", corpusPath + "__checkpoint")
      .trigger(if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime(trigger))
      .start()
  }

  /** Incremental CCNet boilerplate-line dedup — the streaming form of
    * [[graft.functions.DedupFunctions.dedupBoilerplateLines]], which is
    * batch-GLOBAL (distinct-doc counts over the whole corpus) and so
    * cannot simply re-run per wave. State lives in three tables next to
    * the corpus (the q50 incremental-MinHash pattern):
    *
    *  - `<corpus>_lines`   (upsert, key `__line`): accumulated per-line
    *    DISTINCT-URL counts — each wave's (line, url) pairs are anti-
    *    joined against the accumulated index first, so a pair contributes
    *    ONCE across waves (a re-crawled url re-presenting a line does not
    *    double-count it — exactly `countDistinct(url)` over the
    *    accumulated corpus, the batch semantics); the wave then upserts
    *    ONLY the touched lines;
    *  - `<corpus>_linedocs` (append): the (line, url) inverted index —
    *    both the dedup device for the counts above and the device that
    *    makes re-gating TARGETED: when a line crosses the threshold this
    *    wave, the index names exactly the prior docs that contain it;
    *  - `<corpus>_clean`   (upsert, key `url`): the cleaned corpus;
    *    all-boilerplate docs stay as n_kept = 0 tombstones (an upsert
    *    table cannot delete), [[cleanDocs]] filters them. A re-crawled
    *    url's row is the LATEST version's text cleaned against the
    *    current boilerplate set.
    *
    * Re-crawl semantics (pinned by CrawlStreamSpec): counts are MONOTONE —
    * a line that a re-crawled url's new version no longer contains keeps
    * its old count (the accumulated corpus still contains the old version,
    * and `countDistinct(url)` over it still counts the url), so stream ≡
    * batch holds exactly for the boilerplate set; the clean table serves
    * the latest version per url.
    *
    * Per-wave cost: O(wave lines) for the count merge and index append,
    * O(affected docs) for the re-clean — affected = this wave's docs plus
    * the crossing lines' prior docs; the whole corpus is NEVER re-gated.
    * The count merge reads the counts table once per wave (co-keyed
    * full-outer join against the wave's counts); at 100 TB that table is
    * the line-frequency head and tail, sharded by the same key the join
    * uses, so the merge stays one co-partitioned exchange.
    *
    * Crash/replay: every commit carries the wave's batchId, so a replayed
    * wave re-commits nothing. A crash BETWEEN the three commits replays
    * into a partially-advanced state; the count read compensates by
    * subtracting the wave's (recomputable) contribution when `_lines`
    * already committed this wave — all downstream derivations then see
    * the same pre-wave state the crashed run saw, and the remaining
    * commits land identically.
    */
  private[streaming] def maintainLineDedup(
      spark: SparkSession, corpusPath: String, accepted: DataFrame,
      bid: Long, minDupDocs: Int): Unit = {
    import graft.functions.DedupFunctions
    import spark.implicits._
    val linesPath = corpusPath + "_lines"
    val lineDocsPath = corpusPath + "_linedocs"
    val cleanPath = corpusPath + "_clean"

    val waveDocs = accepted.select(col("url"), col("main_text")).persist()
    // one version per url per wave: a wave carrying the same url twice has
    // no defined winner for the keyed clean upsert — refuse loudly
    // (wave-scale agg, nothing corpus-scale)
    val dup = waveDocs.groupBy(col("url")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"wave $bid carries url '${dup.headOption.map(_.getString(0)).getOrElse("")}' " +
        "more than once — a wave must carry at most one version per url")
    val waveLinesAll = DedupFunctions.explodeLines(waveDocs, "url", "main_text")
      .select(col("__line"), col("url")).distinct()
    // the accumulated (line, url) index as it stood BEFORE this wave: when
    // a crash already committed this wave's index append, read the
    // previous table version so the replay computes the SAME contribution
    // the crashed run did (replay identity)
    val lineDocsM = VersionedTable.readManifest(lineDocsPath)
    val priorIndex: Option[DataFrame] = lineDocsM.flatMap { m =>
      if (m.batchId >= bid) {
        // this wave's append already committed; version 1 means it was the
        // FIRST commit, so the pre-wave index is empty
        if (m.version <= 1L) None
        else Some(VersionedTable.read(spark, lineDocsPath, asOfVersion = Some(m.version - 1)))
      } else Some(VersionedTable.read(spark, lineDocsPath))
    }
    // (line, url) pairs NEW to the corpus this wave: a re-crawled url
    // re-presenting a known line contributes nothing (countDistinct
    // semantics), while its genuinely new lines count once
    val waveLines = priorIndex.fold(waveLinesAll)(idx =>
      waveLinesAll.join(idx.select(col("__line"), col("url")),
        Seq("__line", "url"), "left_anti")).persist()
    try {
      val waveCounts = waveLines.groupBy(col("__line"))
        .agg(count(lit(1)).as("__wn"))
      val prevRaw =
        if (VersionedTable.exists(linesPath)) VersionedTable.read(spark, linesPath)
        else Seq.empty[(String, Long)].toDF("__line", "n_docs")
      // replay compensation: if this wave's count upsert already landed
      // (crash between commits), subtract the wave's recomputable
      // contribution to recover the pre-wave counts
      val linesCommitted = VersionedTable.readManifest(linesPath).exists(_.batchId >= bid)
      val prev =
        if (!linesCommitted) prevRaw
        else prevRaw.join(waveCounts, Seq("__line"), "left")
          .select(col("__line"),
            (col("n_docs") - coalesce(col("__wn"), lit(0L))).as("n_docs"))
          .filter(col("n_docs") > 0)
      val merged = prev.join(waveCounts, Seq("__line"), "full_outer")
        .select(col("__line"),
          coalesce(col("n_docs"), lit(0L)).as("__old"),
          coalesce(col("__wn"), lit(0L)).as("__wn"))
        .withColumn("n_docs", col("__old") + col("__wn"))
        .persist()
      try {
        VersionedTable.upsert(spark, linesPath, Seq("__line"),
          compactWrite = (df, dir) => df.write.parquet(dir),
          batchId = Some(bid))(dir =>
          merged.filter(col("__wn") > 0).select(col("__line"), col("n_docs"))
            .write.parquet(dir))
        // prior docs whose lines crossed the threshold THIS wave — the
        // only old docs whose clean_text changes
        val crossed = merged
          .filter(col("__old") < minDupDocs && col("n_docs") >= minDupDocs)
          .select(col("__line"))
        val priorAffected = priorIndex
          .map(_.join(crossed, Seq("__line")).select(col("url")).distinct()
            .except(waveDocs.select(col("url"))))
          .getOrElse(Seq.empty[String].toDF("url"))
        VersionedTable.append(lineDocsPath, Some(bid))(dir =>
          waveLines.write.parquet(dir))
        // a re-crawled url has one corpus row PER WAVE (the corpus is
        // append-only history); re-gating must clean the LATEST version,
        // so pick max ingest_batch per url — the affected set is crossing-
        // line docs only, so this agg is affected-scale, never corpus-scale
        // migration: a corpus created before ingest_batch existed lacks
        // the column — read those rows as wave -1 (strictly before any
        // real wave, so max_by prefers any re-crawl that has happened)
        // instead of failing the continuing stream with AnalysisException
        val corpusRaw = VersionedTable.read(spark, corpusPath)
        val corpusStamped =
          if (corpusRaw.schema.fieldNames.contains("ingest_batch")) corpusRaw
          else corpusRaw.withColumn("ingest_batch", lit(-1L))
        val priorDocs = corpusStamped
          // mixed old/new segments surface the column but with NULLs in
          // the pre-migration rows — same wave -1 reading
          .select(col("url"), col("main_text"),
            coalesce(col("ingest_batch"), lit(-1L)).as("ingest_batch"))
          .join(priorAffected, Seq("url"))
          .groupBy(col("url"))
          .agg(max_by(col("main_text"), col("ingest_batch")).as("main_text"))
        val boiler = merged.filter(col("n_docs") >= minDupDocs).select(col("__line"))
        val cleaned = DedupFunctions.cleanAgainstBoilerplate(
          waveDocs.unionByName(priorDocs), "url", "main_text", boiler)
        VersionedTable.upsert(spark, cleanPath, Seq("url"),
          compactWrite = (df, dir) => df.write.parquet(dir),
          batchId = Some(bid))(dir => cleaned.write.parquet(dir))
      } finally merged.unpersist()
    } finally { waveLines.unpersist(); waveDocs.unpersist() }
    ()
  }

  /** The incrementally-maintained cleaned corpus: (url, clean_text,
    * n_kept, n_dropped), all-boilerplate tombstones filtered — row-for-row
    * what the batch [[graft.functions.DedupFunctions.dedupBoilerplateLines]]
    * returns over the accumulated corpus when every url was crawled once;
    * with re-crawls, the boilerplate SET still equals the batch
    * countDistinct over the accumulated history, and each url's row is
    * its latest version cleaned against that set (see
    * [[maintainLineDedup]]'s re-crawl semantics).
    */
  def cleanDocs(spark: SparkSession, corpusPath: String): DataFrame =
    VersionedTable.read(spark, corpusPath + "_clean")
      .filter(col("n_kept") > 0)
}
