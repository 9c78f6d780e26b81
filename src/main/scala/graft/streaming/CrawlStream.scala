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
    */
  def extractAccepted(records: DataFrame, gateMinTokens: Int = 60,
      minBlockTokens: Int = 5, maxLinkPct: Int = 30): DataFrame = {
    val main = TextFunctions.extractMainText(
      decode(col("body"), "UTF-8"), minBlockTokens, maxLinkPct)
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
    */
  def start(
      spark: SparkSession,
      warcDir: String,
      corpusPath: String,
      gateMinTokens: Int = 60,
      maxFilesPerTrigger: Int = 16,
      trigger: String = "1 minute",
      availableNow: Boolean = false): StreamingQuery = {
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
        // batchId-guarded: a replayed batch is skipped, never re-appended
        VersionedTable.append(corpusPath, Some(bid))(
          dir => accepted.write.parquet(dir))
        ()
      }
      .option("checkpointLocation", corpusPath + "__checkpoint")
      .trigger(if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime(trigger))
      .start()
  }
}
