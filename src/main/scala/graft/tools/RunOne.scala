package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Run selected queries and show row counts — fast iteration helper. */
object RunOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    args(0).split(",").foreach { q =>
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(q)(spark, dir)
        val n = df.count()
        println(f"$q%-24s rows=$n%-8d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        df.show(5, false)
      } catch { case e: Throwable =>
        println(s"$q FAILED: ${e.getMessage}")
      }
    }
  }
}
