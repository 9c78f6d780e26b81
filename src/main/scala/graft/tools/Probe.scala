package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Plan inspector: print the formatted physical plan for named queries. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    args(0).split(",").foreach { q =>
      println(s"########## $q ##########")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
  }
}
