package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Similarity

/** LSH recall/volume sweep for `Similarity.lshTopK` (VERDICT r7 task #4):
  * recall@5 vs exact brute force over a (bits, tables) grid, WITH the
  * candidate-pair volume each config scores — the quantity LSH is supposed
  * to keep far below brute force's |Q|·N. Decides tune-vs-demote on
  * measured evidence.
  *
  * Usage: tools/run.sh graft.tools.LshTune [sfDir]
  */
object LshTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val queriesDf = emb.filter(col("vec_id") < 10)
    val k = 5
    val exact = Similarity.bruteForceTopK(queriesDf, "vec_id", emb, "vec_id", "embedding", k)
    val brute = 10L * n
    println(f"corpus=$n%d  brute-force pairs/query-batch=$brute%d")
    val rows = for (bits <- Seq(3, 4, 5, 6); tables <- Seq(4, 8, 16, 32)) yield {
      val lsh = Similarity.lshTopK(queriesDf, "vec_id", emb, "vec_id", "embedding",
        k, bits = bits, dim = 64, tables = tables)
      val recall = Similarity.recallAtK(exact, lsh, k)
        .agg(avg(col("recall"))).head.getDouble(0)
      // candidate volume = pairs scored before dedup (tables × bucket hits)
      val cands = Similarity.lshCandidatePairs(queriesDf, "vec_id", emb, "vec_id",
        "embedding", bits = bits, dim = 64, tables = tables)
      println(f"bits=$bits%2d tables=$tables%2d  recall@5=$recall%5.2f  " +
        f"cand_pairs=$cands%9d  vs_brute=${cands.toDouble / brute}%5.2f")
      f"""{"bits":$bits,"tables":$tables,"recall_at_5":${math.rint(recall * 1e4) / 1e4},""" +
        f""""cand_pairs":$cands,"vs_brute":${math.rint(cands.toDouble / brute * 1e4) / 1e4}}"""
    }
    val json = s"""{"corpus":$n,"queries":10,"k":$k,"brute_pairs":$brute,""" +
      s""""note":"near-orthogonal corpus = LSH worst case","sweep":[${rows.mkString(",")}]}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("/root/repo/LSHTUNE_r08.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
