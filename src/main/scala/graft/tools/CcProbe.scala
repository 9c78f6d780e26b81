package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.DedupFunctions
import graft.operators.ConnectedComponents

/** Where does q76's time go: the near-dup pair join (edge generation) vs
  * the iterative label-propagation rounds. Informs whether a CC-loop
  * optimization can move the query at all.
  *
  * Usage: tools/run.sh graft.tools.CcProbe [sfDir]
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("CCPROBE_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs = Tables.documents(spark, sfDir)
      .withColumn("len_bucket", floor(col("n_chars") / 100))
    def pairs = DedupFunctions.nearDupNgramJaccard(
      docs, "doc_id", "text",
      blockCols = Seq("lang", "source", "len_bucket"), threshold = 0.06, n = 2)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-14s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    // warm-up pass so JIT/page-cache don't bill the first measurement
    time("warmup-pairs") { pairs.count() }
    time("pairs") { pairs.count() }
    time("cc-full") {
      ConnectedComponents.labelComponents(docs, "doc_id", pairs, "id_a", "id_b").count()
    }
    time("cc-star") {
      ConnectedComponents.labelComponentsStar(docs, "doc_id", pairs, "id_a", "id_b").count()
    }
    spark.stop()
  }
}
