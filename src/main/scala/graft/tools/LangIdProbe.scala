package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.LangId
import graft.Tables

/** Stage-level timing for the q126 chain at a given SF dir: synth build,
  * train (instances collect + driver fold), predict, census — so predict
  * optimizations are judged against the stage they actually move.
  */
object LangIdProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val docs = Tables.documents(spark, dir)
      val base = lower(coalesce(col("text"), lit("")))
      val t = when(col("lang") === "de", translate(base, "aeiou", "iouae"))
        .when(col("lang") === "es", translate(base, "aeiou", "ouaei"))
        .when(col("lang") === "fr", translate(base, "aeiou", "eioua"))
        .when(col("lang") === "zh", translate(base, "aeiou", "uaeio"))
        .otherwise(base)
      val synth = time("synth")(
        docs.select(col("doc_id"), col("lang"), t.as("t")).localCheckpoint(true))
      val model = time("train")(LangId.train(
        synth.filter(col("doc_id") % 10 === 0), "doc_id", "t", "lang",
        Seq("de", "en", "es", "fr", "zh"), buckets = 64, passes = 5, maxChars = 96))
      val pred = time("predict")(
        LangId.predict(synth, "doc_id", "t", model).localCheckpoint(true))
      time("census")(
        pred.join(synth.select(col("doc_id"), col("lang")), Seq("doc_id"))
          .groupBy(col("lang"), col("pred_lang")).agg(count(lit(1))).collect())
    }
    spark.stop()
  }
}
