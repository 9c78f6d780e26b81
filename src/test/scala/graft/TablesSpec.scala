package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the schema-adaptive events loader: the driver regenerated the
  * corpus mid-round-8 switching `events.ts` from TIMESTAMP(NANOS) (read as
  * long under nanosAsLong) to TIMESTAMP_MICROS NTZ, and the unconditional
  * `ts div 1000` normalization broke every events-backed query. All three
  * plausible corpus encodings must normalize to the SAME session-TZ
  * timestamps so oracle comparisons are encoding-invariant.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // one wall-clock instant, expressed in each encoding
  private val micros = Seq(1718000000000000L, 1718000000123456L, 0L)

  private def writeAndLoad(dir: String, write: String => Unit): Seq[Long] = {
    write(dir)
    val df = Tables.table(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"loader must emit session-TZ TimestampType, got ${df.schema("ts").dataType}")
    df.select(unix_micros(col("ts"))).as[Long].collect().sorted.toSeq
  }

  test("nanos-as-long, TIMESTAMP_MICROS NTZ, and TimestampType corpora load identically") {
    val base = Files.createTempDirectory("graft_tables_spec").toString

    val asLong = writeAndLoad(s"$base/nanos", { d =>
      // ns-precision long column named ts — what nanosAsLong yields for a
      // TIMESTAMP(NANOS) parquet file
      micros.map(_ * 1000L).toDF("ts").write.parquet(s"$d/events.parquet")
    })
    val asNtz = writeAndLoad(s"$base/ntz", { d =>
      micros.toDF("us").select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
        .write.parquet(s"$d/events.parquet")
    })
    val asTz = writeAndLoad(s"$base/tz", { d =>
      micros.toDF("us").select(timestamp_micros(col("us")).as("ts"))
        .write.parquet(s"$d/events.parquet")
    })

    assert(asLong == micros.sorted, s"nanos-as-long branch mangled values: $asLong")
    assert(asNtz == micros.sorted, s"NTZ branch mangled values: $asNtz")
    assert(asTz == micros.sorted, s"TimestampType pass-through mangled values: $asTz")
  }

  test("sub-microsecond nanos truncate (not round), matching DuckDB's ns read") {
    val base = Files.createTempDirectory("graft_tables_spec_trunc").toString
    // 999 ns past an exact microsecond must truncate DOWN
    Seq(1718000000000000999L).toDF("ts").write.parquet(s"$base/events.parquet")
    val got = Tables.table(spark, base, "events")
      .select(unix_micros(col("ts"))).as[Long].head()
    assert(got == 1718000000000000L, s"expected truncation to micros, got $got")
  }
}
