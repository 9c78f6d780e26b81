package graft.tools

import org.apache.spark.sql.SparkSession

/** Simulates the driver's smoke check: a bare session (no graft-specific
  * confs) calling SparkEntry.entry — must return rows > 0.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"entry rows=$n")
    assert(n > 0, "entry must return rows")
    spark.stop()
  }
}
