package graft

import org.apache.spark.sql.SparkSession

/** Corpus identity stamp for every measurement artifact (Bench, Verify,
  * probes). Round-8 lesson: the driver regenerated the testdata mid-round
  * (events.ts TIMESTAMP(NANOS) → TIMESTAMP_MICROS NTZ) minutes before the
  * snapshot, and nothing in the committed artifacts recorded which corpus
  * they ran against — "FAILURES: 0" was stale on arrival. Stamping the
  * events-ts logical type and per-table row counts makes any future silent
  * testdata swap self-evident in the artifact diff.
  */
object CorpusFingerprint {
  val tables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** JSON object fragment: {"events_ts_type":"...","rows":{"region":N,...}}.
    * Row counts are parquet-footer reads (count() on an unfiltered scan is
    * metadata-only), so this is cheap even at sf0.1.
    */
  def json(spark: SparkSession, sfDir: String): String = {
    val counts = tables.flatMap { t =>
      try {
        val n = spark.read.parquet(s"$sfDir/$t.parquet").count()
        Some(s""""$t":$n""")
      } catch { case _: Throwable => None }
    }
    val eventsTs =
      try spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType.typeName
      catch { case _: Throwable => "unavailable" }
    // ts range AS NORMALIZED by graft.Tables (µs timestamps): if a corpus
    // regen changes the physical UNIT (e.g. ns-long → µs-long) without
    // changing the type name, the 1000x-shifted range is self-evident here
    // — the type name alone cannot show a unit mismatch.
    val tsRange =
      try {
        import org.apache.spark.sql.functions.{col, min, max, unix_micros}
        val r = Tables.events(spark, sfDir)
          .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head
        s""","events_ts_us_min":${r.getLong(0)},"events_ts_us_max":${r.getLong(1)}"""
      } catch { case _: Throwable => "" }
    s"""{"events_ts_type":"$eventsTs"$tsRange,"rows":{${counts.mkString(",")}}}"""
  }
}
