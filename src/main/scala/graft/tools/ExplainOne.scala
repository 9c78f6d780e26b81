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
    val name = args.headOption.getOrElse(
      sys.error("usage: ExplainOne <queryName> [sfDir]"))
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val fn = graft.SparkEntry.queries.getOrElse(name, sys.error(
      s"unknown query '$name'; known: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    fn(spark, dir).explain("formatted")
  }
}
