package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // harmless if events.parquet is already TIMESTAMP_MICROS; if a corpus
      // regen reverts to TIMESTAMP(NANOS) this reads ns-as-long, which
      // graft.Tables normalizes (matches DuckDB's ns→µs truncation)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // write µs timestamps (not INT96) so DuckDB reads identical values
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Emit timestamps as NTZ (wall-clock, session TZ = UTC) so the driver's
    // DuckDB oracle — whose timestamps are naive — compares values equal.
    def ntz(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.functions.col
      import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
      df.select(df.schema.fields.map { f =>
        if (f.dataType == TimestampType) col(f.name).cast(TimestampNTZType).as(f.name)
        else col(f.name)
      }.toSeq: _*)
    }
    // Collect failures so breakage is a first-class artifact (round 8: the
    // driver simply omitted errored queries from CORRECTNESS and 21 failures
    // were invisible until the judge diffed the query inventory).
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // optional comma-separated filter for local single-query iteration
    // (driver runs unfiltered)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try ntz(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
        failures += name ->
          Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.take(1).mkString.take(200)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Corpus identity + failure manifest alongside the dumps, so the exact
    // input corpus and any broken query are visible in the round artifacts.
    val manifest =
      s"""{"corpus":${CorpusFingerprint.json(spark, sfDir)}""" +
      s""","query_count":${SparkEntry.queries.size}""" +
      s""","failed_count":${failures.size}""" +
      s""","failures":${failures.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")}}"""
    Files.writeString(Paths.get(s"$outDir/verify_manifest.json"), manifest)
    if (failures.nonEmpty)
      System.err.println(s"[verify] WARNING: ${failures.size}/${SparkEntry.queries.size} queries FAILED")
    spark.stop()
  }
}
