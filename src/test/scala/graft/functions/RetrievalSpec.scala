package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry apple"))

  test("termStats: tf, doc_len, df match hand counts") {
    val got = Retrieval.termStats(corpus.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got(("apple", 1L)) == ((3L, 2L, 2L)))   // doc_len 3, tf 2, df 2
    assert(got(("apple", 3L)) == ((4L, 1L, 2L)))
    assert(got(("banana", 2L)) == ((2L, 1L, 2L)))
    assert(got(("cherry", 3L)) == ((4L, 3L, 2L)))
    assert(got.size == 6, got.toString) // (apple,1)(apple,3)(banana,1)(banana,2)(cherry,2)(cherry,3)
  }

  test("bm25TopK matches an independent reference computation") {
    val (k1, b) = (1.2, 0.75)
    val n = 3.0
    val avgdl = 3.0
    def idf(df: Long): Double = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def tfn(tf: Long, dl: Long): Double =
      tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    def r4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0
    val expected = Seq(
      (3L, r4(idf(2) * (tfn(1, 4) + tfn(3, 4))), 2L), // apple + cherry
      (1L, r4(idf(2) * tfn(2, 3)), 1L),               // apple only
      (2L, r4(idf(2) * tfn(1, 2)), 1L))               // cherry only
    val got = Retrieval.bm25TopK(
        corpus.toDF("doc_id", "text"), "doc_id", "text",
        Seq("apple", "cherry"), k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got == expected, s"$got != $expected")
  }

  test("bm25IndexTopK: bit-identical to the inline path; scan is bucket-pruned") {
    val docs = graft.Tables.documents(spark, sfDir)
    val idx = java.nio.file.Files.createTempDirectory("graft_bm25_idx_").toString + "/i"
    Retrieval.bm25IndexWrite(docs, "doc_id", "text", idx, termBuckets = 32)
    for (terms <- Seq(Seq("hash", "join", "scan"), Seq("the", "nosuchtermever"),
        Seq("HASH"))) { // case folding too
      val inline = Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
      val indexed = Retrieval.bm25IndexTopK(spark, idx, terms, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
      assert(indexed == inline, s"indexed != inline for $terms")
    }
    // the posting read must carry a PARTITION filter on tb — only the
    // query terms' bucket directories are touched, never the index scan
    val plan = Retrieval.bm25IndexTopK(spark, idx, Seq("hash"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("tb#"),
      s"indexed BM25 lost bucket pruning:\n$plan")
  }

  test("rrfFuse: hand-computed fusion, commutative, single-list items kept") {
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val b = Seq((20L, 1L), (40L, 2L)).toDF("doc_id", "rank")
    def r4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0
    val expected = Seq(
      (20L, r4(1.0 / 62 + 1.0 / 61), 2L), // in both lists → fused to the top
      (10L, r4(1.0 / 61), 1L),            // rank 1 in a beats rank 2 in b
      (40L, r4(1.0 / 62), 1L),
      (30L, r4(1.0 / 63), 1L))
    def run(lists: Seq[org.apache.spark.sql.DataFrame]) =
      Retrieval.rrfFuse(lists, "doc_id", k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(run(Seq(a, b)) == expected, run(Seq(a, b)).toString)
    assert(run(Seq(b, a)) == expected, "fusion must be commutative in its inputs")
  }

  test("query-term filter pushes below the df window (postings access pattern)") {
    val q = graft.SparkEntry.queries("q79_term_stats")(spark, sfDir)
    val plan = q.queryExecution.optimizedPlan.toString
    val (iWin, iFil) = (plan.indexOf("Window"), plan.indexOf("Filter"))
    assert(iWin >= 0 && iFil > iWin,
      s"term IN (...) must sit BELOW the window (only query postings read):\n$plan")
    assert(q.count() > 0)
  }
}
