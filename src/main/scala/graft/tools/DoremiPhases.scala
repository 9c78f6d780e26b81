package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{NgramLm, TextFunctions}

/** Phase timer for the q135 chain (warm second pass printed). */
object DoremiPhases {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    for (pass <- 1 to 2) {
      println(s"pass $pass")
      val docs = Tables.documents(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("doremi_ph_")
      val pPath = tmp.resolve("p").toString; val rPath = tmp.resolve("r").toString
      timed("train+write") {
        NgramLm.train(docs.filter(col("doc_id") % 20 === 0), "text")
          .coalesce(1).write.mode("overwrite").parquet(pPath)
        NgramLm.train(docs.filter(col("doc_id") % 4 === 0), "text")
          .coalesce(1).write.mode("overwrite").parquet(rPath)
      }
      val scored = NgramLm.scoreDocsDual(docs, "doc_id", "text",
        spark.read.parquet(pPath), spark.read.parquet(rPath))
      val wdf = timed("score+cells+fold") {
        graft.functions.ImportanceSampling.doremiWeightsScored(
          scored, docs, "doc_id", "source", "log_ppl_a", "log_ppl_b")
      }
      val weights = timed("weights collect") {
        wdf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap }
      val total = timed("total agg") {
        docs.agg(sum(coalesce(
          TextFunctions.tokenCount(col("text")).cast("long"), lit(0L)))).head.getLong(0) }
      val wsum = weights.values.sum
      val budgets = weights.map { case (dm, w9) =>
        dm -> (BigInt(total / 2L) * w9 / wsum).toLong }
      timed("mixApply+out") {
        val epochs = graft.functions.ShardExport.mixApplyBudgets(
          docs, "doc_id", "text", "source", budgets)
        epochs.join(broadcast(wdf), Seq("source"))
          .select(col("source"), col("weight9"), col("epoch"),
            col("n_docs"), col("epoch_tokens")).collect()
      }
    }
  }
}
