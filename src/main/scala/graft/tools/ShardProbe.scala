package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.ShardExport

/** Stage-level timing for the physical shard writer at a given SF dir:
  * writeShards (assign + one-file-per-shard write + landed-manifest
  * recompute + two CAS commits), the verified read-back, and the
  * manifest read — so writer changes are judged against the stage they
  * move. Finding recorded here: the write cost is ~15 ms PER SHARD FILE
  * (parquet writer init + footer + rename) independent of shard size, so
  * tiny test budgets measure small-file overhead, not the writer — at
  * production budgets (~1 GB shards) it amortizes to noise.
  */
object ShardProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val budget = if (args.length > 1) args(1).toLong else 4000L
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    for (round <- 1 to 2) {
      println(s"--- round $round (budget=$budget)")
      val root = java.nio.file.Files.createTempDirectory("probe_sw_").toString
      val docs = Tables.documents(spark, dir)
      val n = time("write")(
        ShardExport.writeShards(docs, "doc_id", "text", 8, budget, root).count())
      println(s"  shards=$n")
      time("verify")(ShardExport.readShards(spark, root, "doc_id", "text"))
      time("manifest")(ShardExport.shardManifests(spark, root).count())
    }
    spark.stop()
  }
}
