package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet corpus (TESTDATA.md).
  *
  * The `events` table is written with parquet TIMESTAMP(NANOS), which Spark 4
  * refuses to read natively ([PARQUET_TYPE_ILLEGAL]). We read nanos as a long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microseconds —
  * identical semantics to DuckDB's nanosecond→microsecond read, so oracle
  * comparisons agree.
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
    if (name == "events")
      // ns epoch long → µs timestamp. Integer `div`, NOT `/`: Column./ on
      // longs is double division, which loses ulps above 2^53 ns.
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
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
