package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet corpus (TESTDATA.md).
  *
  * The `events.ts` column has changed physical type across corpus
  * regenerations — TIMESTAMP(NANOS) originally (which Spark 4 refuses to read
  * natively, [PARQUET_TYPE_ILLEGAL], so we read nanos-as-long and truncate),
  * later TIMESTAMP_MICROS (isAdjustedToUTC=false → TimestampNTZ). The loader
  * branches on the *read* schema so either corpus normalizes to the same
  * session-TZ TimestampType (session TZ is UTC, so NTZ→TZ is value-identical)
  * and every downstream query and oracle comparison is unchanged.
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the loader
  * keeps the read schema minimal so Catalyst's column pruning and filter
  * pushdown reach the parquet scan unchanged.
  */
object Tables {
  private def enableNanos(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    enableNanos(spark)
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Normalize `ts` to session-TZ TimestampType regardless of how the corpus
    * encodes it. Pure projection — pushdown/pruning on other columns is
    * unaffected, and a cast on top of the scan stays in whole-stage codegen.
    */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // ns epoch long → µs timestamp. Integer `div`, NOT `/`: Column./ on
        // longs is double division, which loses ulps above 2^53 ns.
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df // already TimestampType
    }

  def region(spark: SparkSession, d: String): DataFrame = table(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = table(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = table(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = table(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = table(spark, d, "lineitem")
  def events(spark: SparkSession, d: String): DataFrame = table(spark, d, "events")
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
