package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

/** The scrub plane (PII redaction + quality filtering) is stateless, so it
  * must run UNCHANGED as a Structured Streaming stage — same Column
  * expressions, stream ≡ batch row-for-row. This is the property that lets
  * a 100 TB backfill (batch) and the live ingest (stream) share one code
  * path, which is the whole point of building on the DataFrame API.
  */
class StreamingScrubSpec extends SparkSpec {
  import spark.implicits._

  // the shared transform — ONE definition applied to both engines
  private def scrub(df: DataFrame): DataFrame = {
    val toks = filter(split(lower(col("text")), "\\s+"), x => length(x) > 0)
    df.select(col("doc_id"), TextFunctions.redactPii(col("text")).as("clean"), toks.as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), col("clean"), size(col("t")).cast("long").as("n_tokens"))
  }

  test("stream ≡ batch for the stateless scrub stage, across multiple micro-batches") {
    val srcDir = Files.createTempDirectory("graft_scrub_src_").toString
    val ckpt = Files.createTempDirectory("graft_scrub_ckpt_").toString
    val outDir = Files.createTempDirectory("graft_scrub_out_").toString
    val rows1 = Seq(
      (1L, "email me at a.b@example.com and call 555-010-1234 soon"),
      (2L, "too short"),
      (3L, "three clean tokens here"))
    val rows2 = Seq(
      (4L, "ssn 123-45-6789 hides in 10.0.0.1 traffic logs"),
      (5L, "another perfectly ordinary document body"))
    rows1.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(srcDir)

    def drain(): Unit = {
      val q = scrub(spark.readStream.schema(rows1.toDF("doc_id", "text").schema).parquet(srcDir))
        .writeStream.format("parquet").outputMode("append")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    drain()
    rows2.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(srcDir)
    drain()

    val streamed = spark.read.parquet(outDir).as[(Long, String, Long)].collect().toSet
    val batch = scrub((rows1 ++ rows2).toDF("doc_id", "text")).as[(Long, String, Long)].collect().toSet
    assert(streamed == batch, s"stream/batch diverged:\n$streamed\nvs\n$batch")
    assert(batch.exists(_._2.contains("[EMAIL]")) && batch.exists(_._2.contains("[SSN]")))
    assert(!batch.exists(_._1 == 2L), "quality filter must drop the short doc in both modes")
  }
}
