package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{DedupFunctions, TextFunctions}

/** One-off stage timing for the contamination query: is the cost in the
  * per-row gram construction (HOF lambdas), the broadcast probe, or the
  * aggregation? Run: tools/run.sh graft.tools.ContamProbe <sfDir>
  */
object ContamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
    }

    val docs = Tables.documents(spark, dir)
    docs.count() // warm page cache

    val n = 3
    def grams(text: org.apache.spark.sql.Column) = {
      val tok = TextFunctions.tokens(lower(text))
      when(size(tok) >= n,
        array_distinct(transform(
          sequence(lit(0), size(tok) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(tok, i + j + 1)): _*))))
        .otherwise(array().cast("array<string>"))
    }

    t("tokenize only") {
      docs.select(size(TextFunctions.tokens(lower(col("text")))).as("n")).agg(sum("n")).head(); docs.count()
    }
    t("grams construct + explode") {
      docs.filter(col("doc_id") % 50 =!= 0)
        .select(explode(grams(col("text")))).count()
    }
    t("eval grams distinct") {
      docs.filter(col("doc_id") % 50 === 0)
        .select(explode(grams(col("text"))).as("gram")).distinct().count()
    }
    t("full operator") {
      DedupFunctions.contaminationNgramOverlap(
        docs.filter(col("doc_id") % 50 =!= 0), "doc_id", "text",
        docs.filter(col("doc_id") % 50 === 0), "text", n).count()
    }
    spark.stop()
  }
}
