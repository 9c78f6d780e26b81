package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.expressions.VecDot
import graft.functions.Similarity

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val emb = Tables.embeddings(spark, dir)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("bare dot agg") {
      val q = emb.filter(col("vec_id") < 10).select(col("embedding").as("qv"))
      emb.crossJoin(broadcast(q))
        .select(VecDot(col("embedding"), col("qv")).as("d"))
        .agg(sum("d")).collect(); 1L
    }
    time("dot+norms+round") {
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        .withColumn("qn", Similarity.norm(col("qv")))
      val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
        .withColumn("cn", Similarity.norm(col("cv")))
      c.crossJoin(broadcast(q))
        .select(round(VecDot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("cos"))
        .agg(sum("cos")).collect(); 1L
    }
    time("full bruteForceTopK") {
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 10), "vec_id",
        emb, "vec_id", "embedding", k = 5).count()
    }
    Similarity.bruteForceTopK(emb.filter(col("vec_id") < 10), "vec_id",
      emb, "vec_id", "embedding", k = 5).explain("formatted")
  }
}
