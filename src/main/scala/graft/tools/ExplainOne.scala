package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of one SparkEntry query (scratch). */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    graft.SparkEntry.queries(args(0))(spark, dir).explain("formatted")
  }
}
