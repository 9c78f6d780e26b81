package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.NgramLm

/** Debug probe for the q135 DoReMi chain: dumps the engine-side per-doc
  * proxy/ref grid scores and the (domain, batch) excess cells so the
  * DuckDB oracle's intermediates can be diffed stage by stage.
  */
object DoremiProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "/tmp/doremi_probe"
    val docs = Tables.documents(spark, dir)
    val pLm = NgramLm.train(docs.filter(col("doc_id") % 20 === 0), "text")
    val rLm = NgramLm.train(docs.filter(col("doc_id") % 4 === 0), "text")
    val pScored = NgramLm.scoreDocs(docs, "doc_id", "text", pLm, 0.0)
      .select(col("doc_id"), floor(col("log_ppl") * 1e4 + 0.5).cast("long").as("p4"))
    val rScored = NgramLm.scoreDocs(docs, "doc_id", "text", rLm, 0.0)
      .select(col("doc_id"), floor(col("log_ppl") * 1e4 + 0.5).cast("long").as("r4"))
    val joined = pScored.join(rScored, Seq("doc_id"))
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("doc_id"), col("source"),
        pmod(xxhash64(col("doc_id").cast("string")), lit(8L)).as("t"),
        col("p4"), col("r4"),
        greatest(col("p4") - col("r4"), lit(0L)).as("eq"))
    joined.write.mode("overwrite").parquet(out + "/docs")
    joined.groupBy(col("source"), col("t"))
      .agg(count(lit(1)).as("n"), sum(col("eq")).as("sq"))
      .write.mode("overwrite").parquet(out + "/cells")
    println("probe written to " + out)
  }
}
