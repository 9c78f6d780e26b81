package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over a document corpus: inverted-index statistics and
  * BM25 ranking (Robertson & Zaragoza 2009) — the lexical complement to the
  * embedding ANN plane (hybrid search runs both and fuses).
  *
  * Scale shape: the posting table (term, doc_id, tf) is ONE
  * map-side-combined aggregation over exploded tokens; everything
  * query-time is driven off `term IN (query terms)` — a pushed-down filter
  * that reads only the query terms' postings (the inverted-index access
  * pattern; with the posting table landed partitioned-by-term-bucket it
  * becomes partition pruning). Document-frequency and corpus stats are
  * term-level aggregates, orders of magnitude smaller than the corpus.
  */
object Retrieval {

  /** Posting-list statistics: one row per (term, doc) with the term
    * frequency, the document length, and the term's document frequency —
    * the complete sufficient statistics for TF-IDF/BM25 scoring.
    */
  def termStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(
      col(idCol).as("doc_id"),
      TextFunctions.tokens(lower(col(textCol))).as("__t"))
    val postings = toks
      .select(col("doc_id"), size(col("__t")).cast("long").as("doc_len"),
        explode(col("__t")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("doc_len"))
      .agg(count(lit(1)).as("tf"))
    postings.withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
  }

  /** BM25 top-k documents for a bag-of-words query. Postings are filtered
    * to the query terms FIRST (pushed-down scan predicate), so scoring
    * touches |query terms| posting lists, never the corpus. Deterministic
    * tie-break: rounded score desc, doc_id asc.
    */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val stats = termStats(docs, idCol, textCol)
      .filter(col("term").isin(queryTerms.map(_.toLowerCase): _*))
    val corpus = docs.agg(
      count(lit(1)).as("n_docs"),
      avg(TextFunctions.tokenCount(lower(col(textCol)))).as("avgdl")).head
    scoreBm25(stats, corpus.getLong(0), corpus.getDouble(1), k, k1, b)
  }

  /** The BM25 scoring tail shared by the inline and the indexed paths —
    * ONE spelling, so the indexed read provably computes the identical
    * IEEE-double expression tree (same association order) as the inline
    * scan. Robertson-Sparck Jones idf with the +1 smoothing (Lucene's
    * form); deterministic tie-break (rounded score desc, id asc).
    */
  private def scoreBm25(stats: DataFrame, nDocs: Long, avgdl: Double,
      k: Int, k1: Double, b: Double): DataFrame = {
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * (lit(k1) + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("doc_len") / lit(avgdl)))
    stats
      .withColumn("__s", idf * tfNorm)
      .groupBy(col("doc_id"))
      .agg(sum(col("__s")).as("s"), count(lit(1)).as("n_terms_hit"))
      .select(col("doc_id"), TextFunctions.round4(col("s")).as("score"), col("n_terms_hit"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Land the inverted index PHYSICALLY, partitioned by term bucket —
    * the retrieval plane's persisted-index leg (the `ivfPqIndexWrite`
    * pattern): `postings/tb=<xxhash64(term) mod B>/` parquet holding the
    * complete (term, doc_id, doc_len, tf, df) sufficient statistics, plus
    * a one-row `corpus` table (doc count, token totals, B). Query time
    * then reads ONLY the query terms' bucket directories — static
    * partition pruning, never a corpus scan, exactly how a 100 TB corpus
    * serves lexical queries (df is baked per posting at build time, so no
    * query-time window over the term partition either).
    */
  def bm25IndexWrite(docs: DataFrame, idCol: String, textCol: String,
      dir: String, termBuckets: Int = 64): Unit = {
    require(termBuckets > 0, s"termBuckets must be positive, got $termBuckets")
    termStats(docs, idCol, textCol)
      .withColumn("tb", pmod(xxhash64(col("term")), lit(termBuckets.toLong)))
      .write.mode("overwrite").partitionBy("tb")
      .parquet(dir + "/postings")
    docs.agg(
        count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(lower(col(textCol))).cast("long"))
          .as("total_tokens"),
        count(TextFunctions.tokenCount(lower(col(textCol)))).as("tok_docs"))
      .withColumn("term_buckets", lit(termBuckets))
      .write.mode("overwrite").parquet(dir + "/corpus")
  }

  /** BM25 top-k off a landed [[bm25IndexWrite]] index: the term filter
    * plus the derived bucket filter reach the scan as a PARTITION filter
    * (only the query terms' `tb=` directories are read) and a pushed
    * predicate; scoring is the same [[scoreBm25]] expression tree as the
    * inline path, so indexed and inline results are bit-identical.
    */
  def bm25IndexTopK(spark: org.apache.spark.sql.SparkSession, dir: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val corpus = spark.read.parquet(dir + "/corpus").head
    val nDocs = corpus.getAs[Long]("n_docs")
    val avgdl = corpus.getAs[Long]("total_tokens").toDouble /
      corpus.getAs[Long]("tok_docs").toDouble
    val tb = corpus.getAs[Int]("term_buckets").toLong
    val terms = queryTerms.map(_.toLowerCase).distinct
    // the terms' buckets, via the engine's own xxhash64 (one tiny job —
    // guaranteed bit-identical to the build-side bucketing)
    import spark.implicits._
    val buckets = terms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(tb)))
      .collect().map(_.getLong(0)).distinct.toSeq
    val stats = spark.read.parquet(dir + "/postings")
      .filter(col("tb").isin(buckets: _*) && col("term").isin(terms: _*))
    scoreBm25(stats, nDocs, avgdl, k, k1, b)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) — the
    * standard hybrid-search combiner: each input ranking contributes
    * 1/(k0 + rank) per document, summed across rankings. Scale-free (no
    * score normalization across heterogeneous scorers like BM25 vs
    * cosine), commutative in its inputs, and tiny: rankings are top-k
    * lists, so the fusion is a union + one aggregation over k·|rankings|
    * rows regardless of corpus size.
    *
    * Each input must carry (`idCol`, `rank`) with rank starting at 1.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, k: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    rankings
      .map(_.select(col(idCol),
        (lit(1.0) / (lit(k0.toDouble) + col("rank"))).as("__c")))
      .reduce(_ unionAll _)
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("s"), count(lit(1)).as("n_lists"))
      .select(col(idCol), TextFunctions.round4(col("s")).as("rrf_score"), col("n_lists"))
      .orderBy(col("rrf_score").desc, col(idCol).asc)
      .limit(k)
  }
}
