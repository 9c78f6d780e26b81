package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style n-gram language-model perplexity filtering — the classic
  * pretraining-corpus quality gate (train a small LM on a trusted reference
  * split, drop documents whose perplexity under it is an outlier; cf.
  * Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets from
  * Web Crawl Data", 2020). Reference-surface context: quality filtering over
  * the documents table, alongside the heuristic scores in [[TextFunctions]].
  *
  * Model: bigram counts with add-one smoothing over the context vocabulary,
  *   p(w2 | w1) = (c(w1,w2) + 1) / (c(w1) + V),
  * where c(w1) = Σ_w2 c(w1,w2) (exact context totals) and V = |{w1}| (the
  * context vocabulary). Scoring emits the average negative log-probability
  * per bigram (= log-perplexity; monotone in perplexity, so thresholds
  * filter identically) — deliberately NOT exp()'d, keeping the oracle
  * arithmetic to one cross-engine `ln` per term.
  *
  * 100 TB shape: training is one groupBy over exploded bigrams (map-side
  * combined; the model table shuffles by gram and never visits the driver).
  * Scoring joins exploded document bigrams against the model BY GRAM — the
  * canonical map-reduce LM-scoring co-partitioning, no broadcast of the
  * (potentially huge) model — then one groupBy(doc) for the per-document
  * reduction. The only broadcast is the 1-row vocab-size frame: a
  * `crossJoin(broadcast(...))` that plans as a nested loop over exactly
  * one broadcast row — O(n × 1), allowlisted by the plan audit alongside
  * the exact-ANN broadcast fan-outs.
  */
object NgramLm {

  /** Tokenization shared with the rest of the text plane (ONE definition,
    * [[TextFunctions.tokens]]): lowercase, whitespace split, empties
    * dropped.
    */
  private def toks(text: Column): Column = TextFunctions.tokens(lower(text))

  /** (w1, w2) bigram structs of a text column; empty below two tokens.
    * A single-pass JVM expression — the declarative
    * `transform(sequence(...))` spelling is ~20× slower (interpreted
    * lambda per element; see [[graft.expressions.TokenBigrams]]).
    */
  private def bigrams(text: Column): Column =
    graft.expressions.TextHashExpressions.tokenBigrams(toks(text))

  /** Train: bigram count table (w1, w2, c12) — THE model. Context totals
    * and the vocabulary size are derived from it at scoring time, so the
    * persisted model is a single table.
    */
  def train(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(bigrams(col(textCol))).as("g"))
      .select(col("g.w1").as("w1"), col("g.w2").as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))

  /** Score: per document, the average negative log-probability of its
    * bigrams under the model (round4, the engine's oracle-stable rounding)
    * plus a keep/drop verdict at `threshold`. Documents with fewer than two
    * tokens have no bigrams and are excluded — they have no perplexity.
    */
  def scoreDocs(
      docs: DataFrame, idCol: String, textCol: String,
      lm: DataFrame, threshold: Double): DataFrame = {
    val uni = lm.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vDf = uni.agg(count(lit(1)).cast("double").as("v"))
    val pairs = docs
      .select(col(idCol).as("doc_id"), explode(bigrams(col(textCol))).as("g"))
      .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"))
    pairs
      .join(lm, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .crossJoin(broadcast(vDf))
      .select(col("doc_id"),
        log((coalesce(col("c12"), lit(0L)) + lit(1.0)) /
          (coalesce(col("c1"), lit(0L)) + col("v"))).as("__lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        TextFunctions.round4(-sum(col("__lp")) / count(lit(1))).as("log_ppl"))
      .withColumn("kept", (col("log_ppl") <= threshold).cast("long"))
  }

  /** Score under TWO models in ONE pass over the exploded bigrams — the
    * DoReMi shape (proxy + reference losses for every document): one
    * explode, four gram-keyed model joins, one per-doc aggregation,
    * instead of two full [[scoreDocs]] chains. Both models use the same
    * add-one arithmetic and round4 contract as [[scoreDocs]], so each
    * output column is bit-identical to the corresponding single-model
    * scoring. Returns (doc_id, n_bigrams, log_ppl_a, log_ppl_b).
    */
  def scoreDocsDual(
      docs: DataFrame, idCol: String, textCol: String,
      lmA: DataFrame, lmB: DataFrame): DataFrame = {
    val uniA = lmA.groupBy(col("w1")).agg(sum(col("c12")).as("__c1a"))
    val uniB = lmB.groupBy(col("w1")).agg(sum(col("c12")).as("__c1b"))
    val vs = uniA.agg(count(lit(1)).cast("double").as("__va"))
      .crossJoin(uniB.agg(count(lit(1)).cast("double").as("__vb")))
    val pairs = docs
      .select(col(idCol).as("doc_id"), explode(bigrams(col(textCol))).as("g"))
      .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"))
    pairs
      .join(lmA.withColumnRenamed("c12", "__c12a"), Seq("w1", "w2"), "left")
      .join(lmB.withColumnRenamed("c12", "__c12b"), Seq("w1", "w2"), "left")
      .join(uniA, Seq("w1"), "left")
      .join(uniB, Seq("w1"), "left")
      .crossJoin(broadcast(vs))
      .select(col("doc_id"),
        log((coalesce(col("__c12a"), lit(0L)) + lit(1.0)) /
          (coalesce(col("__c1a"), lit(0L)) + col("__va"))).as("__lpa"),
        log((coalesce(col("__c12b"), lit(0L)) + lit(1.0)) /
          (coalesce(col("__c1b"), lit(0L)) + col("__vb"))).as("__lpb"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        TextFunctions.round4(-sum(col("__lpa")) / count(lit(1))).as("log_ppl_a"),
        TextFunctions.round4(-sum(col("__lpb")) / count(lit(1))).as("log_ppl_b"))
  }

  /** Interpolated Kneser–Ney scoring (Kneser & Ney 1995, in Chen &
    * Goodman 1999's interpolated form) — the smoothing family KenLM uses,
    * and what CCNet's 5-gram gate actually runs; this is the bigram
    * member over the SAME persisted model table as [[scoreDocs]]:
    *
    *   p(w2|w1) = max(c12−D,0)/c1 + (D·N1+(w1·)/c1) · Pcont(w2)   (w1 seen)
    *            = Pcont(w2)                                        (w1 unseen)
    *   Pcont(w2) = (N1+(·w2)+1) / (T+V)
    *
    * where N1+(w1·)/N1+(·w2) are distinct-successor/-predecessor type
    * counts, T = bigram types, V = continuation vocabulary. The
    * continuation distribution is add-one smoothed so unseen words keep
    * nonzero mass (the OOV floor; KenLM's explicit OOV reservation has no
    * closed cross-engine restatement). D = 0.75 — exactly representable
    * in binary, so discounting introduces no rounding contract beyond
    * q89's one-`ln`-per-term precedent.
    *
    * 100 TB shape, same as [[scoreDocs]]: every derived statistic
    * (c1/n1p by w1, nc by w2) is a groupBy OF THE MODEL joined back by
    * gram key — co-partitioned shuffles, never a model broadcast; the
    * only broadcast is the 1-row (T,V) frame (plan-audit-allowlisted
    * O(n × 1) attach).
    */
  def scoreDocsKN(
      docs: DataFrame, idCol: String, textCol: String,
      lm: DataFrame, threshold: Double, discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1), got $discount")
    val uni = lm.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).cast("double").as("n1p"))
    val cont = lm.groupBy(col("w2")).agg(count(lit(1)).cast("double").as("nc"))
    // T = Σ nc = bigram types; V = |{w2}| — one pass over the cont table
    val tv = cont.agg(sum(col("nc")).as("t"), count(lit(1)).cast("double").as("v"))
    val pairs = docs
      .select(col(idCol).as("doc_id"), explode(bigrams(col(textCol))).as("g"))
      .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"))
    val pcont = (coalesce(col("nc"), lit(0.0)) + lit(1.0)) / (col("t") + col("v"))
    val d = lit(discount)
    val pSeen = greatest(coalesce(col("c12"), lit(0L)).cast("double") - d, lit(0.0)) /
      col("c1") + (d * col("n1p") / col("c1")) * pcont
    pairs
      .join(lm, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(tv))
      .select(col("doc_id"),
        log(when(col("c1").isNotNull, pSeen).otherwise(pcont)).as("__lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        TextFunctions.round4(-sum(col("__lp")) / count(lit(1))).as("log_ppl"))
      .withColumn("kept", (col("log_ppl") <= threshold).cast("long"))
  }

  /** CCNet head/middle/tail selection (Wenzek et al. 2020 §4.4): within
    * each language, the best-scoring third of documents is "head", the
    * next "middle", the rest "tail" — the split that decides what
    * actually enters the corpus (head+middle, typically).
    *
    * Buckets are cut on the round4 ppl GRID, cells atomic: per
    * (lang, ppl) counts, a running total over the cell table, and a cell
    * goes to head/middle/tail by `3·cum_before < n` / `< 2n`. Equal-ppl
    * docs land in the same bucket by construction (no float-threshold
    * tie ambiguity), and — the 100 TB point — the ONLY window rides the
    * model-scale cell table (#langs × distinct round4 scores), never the
    * corpus: a dominant language costs a cell-table sort, not a
    * single-task sort of its full document set (the q107 lesson). Docs
    * reach their bucket through a co-partitioned (or broadcastable)
    * (lang, ppl) join.
    *
    * Input: a scored relation (from [[scoreDocs]] joined with a language
    * column); output: input + `bucket`.
    */
  def pplBuckets(scored: DataFrame, langCol: String, pplCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(langCol)).orderBy(col(pplCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.partitionBy(col(langCol))
    val cells = scored.groupBy(col(langCol), col(pplCol))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", coalesce(sum(col("__c")).over(w), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(whole))
      .select(col(langCol), col(pplCol),
        when(col("__cum") * 3 < col("__n"), "head")
          .when(col("__cum") * 3 < col("__n") * 2, "middle")
          .otherwise("tail").as("bucket"))
    scored.join(cells, Seq(langCol, pplCol))
  }
}
