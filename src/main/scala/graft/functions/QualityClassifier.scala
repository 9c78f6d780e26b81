package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Model-based quality filtering: a linear text classifier over hashed
  * bag-of-words features — the public fastText-shaped recipe behind
  * "quality classifier" gates in LLM data pipelines (GPT-3 / LLaMA train a
  * cheap linear model on heuristic or reference-corpus labels, then score
  * the whole crawl). The reference surface has no trained model; this
  * extends the text-analysis plane (SURVEY §7) with the training step, not
  * just fixed heuristics. q105 distills the token-count quality gate into
  * the model (this synthetic corpus's vocabulary is uniform across
  * langs/sources — length is its only learnable bag-of-words signal).
  *
  * Algorithm: **online averaged perceptron** (Collins 2002, the standard
  * NLP trainer): one sequential pass order (doc id ascending), update
  * `w += y·x` on every margin violation (`y·(w·x+b) ≤ 0`), and score with
  * the SUM of the per-step iterates (same sign as the average — avoids a
  * division, keeping everything integer). Batch-summed perceptron updates
  * were tried first and diverge on this task (lr=1 full-batch gradients
  * oscillate; measured 0.45 accuracy vs 0.91 for the averaged online
  * pass) — the online/averaged variant is not a stylistic choice.
  *
  * Architecture (the fastText split, and the 100 TB story):
  *  - the FEATURE PROJECTION is distributed: tokenize → xxhash64-bucket →
  *    per-(doc,bucket) counts, one map-side-combined agg over the corpus;
  *  - the OPTIMIZATION LOOP runs on a driver-collected sample of hashed
  *    count vectors, BOUNDED like the BPE dictionary: `maxTrainDocs`
  *    REFUSES (never truncates) past the cap. At corpus scale you train on
  *    a deterministic sample (e.g. an md5-order limit, the q68 mixing
  *    pattern) — fastText itself is a single-node trainer; the corpus-scale
  *    part of a quality gate is scoring, not training;
  *  - SCORING is fully distributed with ZERO joins: the B+1 integer model
  *    ships as a literal map, so a scored doc costs one map-side lookup-sum
  *    plus the single per-doc aggregation (the q99 DSIR shape).
  *
  * Determinism (the oracle story): counts, weights, margins are all
  * INTEGERS and the pass order is a total order on ids, so training and
  * scoring are exact — like the int8-SQ ANN (q100), the DuckDB oracle
  * (a `list_reduce` fold over the same id-ordered dense vectors) carries
  * NO rounding contract and reproduces the model bit-for-bit.
  */
object QualityClassifier {

  /** `weights`/`bias`: final iterate. `avgWeights`/`avgBias`: per-step sum
    * of iterates (Collins averaging, unnormalized — sign-equivalent to the
    * mean). `updates`: margin violations seen (diagnostics).
    */
  case class PerceptronModel(
      buckets: Int,
      weights: Array[Long], bias: Long,
      avgWeights: Array[Long], avgBias: Long,
      updates: Long)

  /** (__id, __b, __c) hashed-unigram count instances — the distributed
    * feature projection shared by training and scoring.
    */
  private def instances(
      docs: DataFrame, idCol: String, textCol: String, buckets: Int): DataFrame =
    docs
      .select(col(idCol).as("__id"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("__w"))
      .select(col("__id"), pmod(xxhash64(col("__w")), lit(buckets.toLong)).as("__b"))
      .groupBy(col("__id"), col("__b"))
      .agg(count(lit(1)).as("__c"))

  /** Train an online averaged perceptron. `label` is a boolean Column over
    * `docs` (true → +1). Docs with zero tokens train on bias alone. The
    * pass order is id ascending (ids must be orderable and unique — the
    * usual doc-id contract).
    */
  def trainPerceptron(
      docs: DataFrame, idCol: String, textCol: String, label: Column,
      buckets: Int = 64, passes: Int = 10,
      maxTrainDocs: Int = 100000): PerceptronModel = {
    val (rows, dense) =
      collectDense(docs, idCol, textCol, label, lit(0L), buckets, maxTrainDocs)
    trainFromDense(rows.map(t => (t._1, t._2)), dense, buckets, passes)
  }

  /** One bounded driver collect of the training matrix: id-ordered
    * (id, label, tag) rows plus the dense hashed count vectors. The
    * data-scale work is distributed (tokenize + one map-side-combined
    * agg); only ≤ cap×B count rows land on the driver. cap+1 rows detect
    * overflow without an extra count job (the BPE-cap pattern); past the
    * cap the collect REFUSES, never truncates.
    */
  private def collectDense(
      docs: DataFrame, idCol: String, textCol: String, label: Column,
      tag: Column, buckets: Int, maxTrainDocs: Int)
      : (Array[(Any, Long, Long)], collection.Map[Any, Array[Long]]) = {
    require(buckets >= 2 && buckets <= 4096, s"buckets must be in [2,4096], got $buckets")
    require(maxTrainDocs >= 1, s"maxTrainDocs must be >= 1, got $maxTrainDocs")
    val lblRows = docs
      .select(col(idCol).as("__id"), when(label, 1L).otherwise(-1L).as("__y"),
        tag.cast("long").as("__tag"))
      .orderBy(col("__id"))
      .limit(maxTrainDocs + 1)
      .collect()
    require(lblRows.length <= maxTrainDocs,
      s"perceptron training set exceeds maxTrainDocs=$maxTrainDocs docs. Train on a " +
        s"bounded deterministic sample (md5-order limit, the q68 mixing pattern) or " +
        s"raise the cap — refusing rather than truncating or exhausting driver memory.")
    // a null tag (e.g. a fold expression over null text) would NPE below
    // and, worse, silently vanish from every holdout filter — refuse it
    lblRows.find(_.isNullAt(2)).foreach { r =>
      throw new IllegalArgumentException(
        s"fold/tag column is NULL for doc id ${r.get(0)} — the fold expression " +
          s"must be total (non-null) over every doc; coalesce it at the call site.")
    }
    val instRows = instances(docs, idCol, textCol, buckets).collect()
    val dense = scala.collection.mutable.HashMap.empty[Any, Array[Long]]
    instRows.foreach { r =>
      val x = dense.getOrElseUpdate(r.get(0), Array.fill(buckets)(0L))
      x(r.getLong(1).toInt) += r.getLong(2)
    }
    (lblRows.map(r => (r.get(0), r.getLong(1), r.getLong(2))), dense)
  }

  /** The driver-side optimization loop over an id-ordered (id, label)
    * sequence and its dense vectors. */
  private def trainFromDense(
      ordered: Seq[(Any, Long)], dense: collection.Map[Any, Array[Long]],
      buckets: Int, passes: Int): PerceptronModel = {
    require(passes >= 1, s"passes must be >= 1, got $passes")
    val empty = Array.fill(buckets)(0L)
    val w = Array.fill(buckets)(0L)
    val avgW = Array.fill(buckets)(0L)
    var bias = 0L
    var avgBias = 0L
    var updates = 0L
    for (_ <- 1 to passes; (id, y) <- ordered) {
      val x = dense.getOrElse(id, empty)
      var m = bias
      var b = 0
      while (b < buckets) { m += w(b) * x(b); b += 1 }
      if (y * m <= 0L) {
        b = 0
        while (b < buckets) { w(b) += y * x(b); b += 1 }
        bias += y
        updates += 1L
      }
      b = 0
      while (b < buckets) { avgW(b) += w(b); b += 1 }
      avgBias += bias
    }
    PerceptronModel(buckets, w, bias, avgW, avgBias, updates)
  }

  /** Score docs with a trained model: (idCol, margin, pred, label) — all
    * BIGINT, hash-exact. Uses the AVERAGED weights. The margin is a
    * per-row HOF fold over the token array against the literal weight
    * map, so scoring is pure scan → map: NO join, NO aggregation, NO
    * exchange of any kind (`QualityClassifierSpec` pins the plan) — this
    * is the corpus-scale pass. Integer sums in document token order equal
    * the oracle's any-order integer sums exactly.
    */
  def scorePerceptron(
      docs: DataFrame, idCol: String, textCol: String, label: Column,
      model: PerceptronModel): DataFrame = {
    val wMap = typedLit(
      model.avgWeights.zipWithIndex.map { case (v, b) => b.toLong -> v }.toMap)
    // coalesce: a null text scores on bias alone, matching the trainer's
    // zero-token handling (and the oracle's LEFT JOIN + coalesce)
    val margin = aggregate(
      transform(
        coalesce(TextFunctions.tokens(lower(col(textCol))),
          typedLit(Seq.empty[String])),
        w => element_at(wMap, pmod(xxhash64(w), lit(model.buckets.toLong)))),
      lit(0L), (acc, x) => acc + x) + lit(model.avgBias)
    docs.select(col(idCol),
      margin.as("margin"),
      when(margin > 0L, 1L).otherwise(-1L).as("pred"),
      when(label, 1L).otherwise(-1L).as("label"))
  }

  /** Train + score in one call (the q105 shape). */
  def trainAndScore(
      docs: DataFrame, idCol: String, textCol: String, label: Column,
      buckets: Int = 64, passes: Int = 10): DataFrame = {
    val m = trainPerceptron(docs, idCol, textCol, label, buckets, passes)
    scorePerceptron(docs, idCol, textCol, label, m)
  }

  /** Uncertainty sampling (active learning): the k docs the model is LEAST
    * sure about — smallest |margin|, id tie-break — are the ones worth
    * human labels next; the standard active-labeling loop for quality
    * gates. Plans as TakeOrderedAndProject over the shuffle-free scoring
    * pass (per-task size-k heaps, k-row driver merge — no global sort).
    */
  def uncertaintySample(
      docs: DataFrame, idCol: String, textCol: String, label: Column,
      model: PerceptronModel, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    scorePerceptron(docs, idCol, textCol, label, model)
      .orderBy(abs(col("margin")), col(idCol))
      .limit(k)
  }

  /** Domain-calibrated quality gate: keep the top `permille`‰ of docs PER
    * DOMAIN by margin. A single global threshold starves whole domains —
    * a domain whose score distribution sits low loses everything while a
    * high-sitting one sails through untrimmed — so production corpus
    * filters cut per-domain percentiles instead. quota_d =
    * floor(n_d · permille / 1000), exact integer arithmetic; ties broken
    * by (md5(id), id) so the cut is deterministic on any engine.
    *
    * Scale shape (the q107 pattern): the per-domain doc counts are a
    * model-scale aggregate collected to the driver to turn quotas into
    * the LITERAL rank bound the WindowGroupLimit pre-trim needs — rank
    * per domain by (margin desc, md5(id), id), pre-trim at the literal
    * max quota, broadcast-join the quota table, exact filter after. The
    * dominant domain never single-task sorts its full corpus slice.
    * `scored` must carry (idCol, domainCol, margin) — the
    * [[scorePerceptron]] output joined to the domain column.
    */
  def keepTopPerDomain(
      scored: DataFrame, idCol: String, domainCol: String,
      permille: Long): DataFrame = {
    require(permille > 0 && permille <= 1000,
      s"permille must be in (0, 1000], got $permille")
    val counts = scored.groupBy(col(domainCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val quotaRows = counts
      .map { case (d, n) => (d, n * permille / 1000L) }
      .filter(_._2 > 0L).toSeq
    val maxQ = quotaRows.map(_._2).foldLeft(0L)(math.max)
    Sampling.ensureGroupLimitThreshold(scored, maxQ)
    val spark = scored.sparkSession
    import spark.implicits._
    val quotas = quotaRows.toDF("__dom", "__quota")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__dom"))
      .orderBy(col("margin").desc, md5(col(idCol).cast("string")), col(idCol))
    scored.select(col(idCol), col(domainCol).as("__dom"), col("margin"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= lit(maxQ))
      .join(broadcast(quotas), Seq("__dom"))
      .filter(col("__rk") <= col("__quota"))
      .select(col(idCol), col("__dom").as(domainCol), col("margin"),
        col("__rk").cast("long").as("domain_rank"), col("__quota").as("quota"))
  }

  /** Self-training (pseudo-label distillation): train a teacher on the
    * `isLabeled` slice, let it label everything else, retrain a student on
    * the union — the standard semi-supervised recipe for stretching a
    * small labeled set over a large corpus. Returns (teacher, student).
    * Deterministic end to end: pseudo-labels are integer-margin signs and
    * both training runs are the id-ordered integer loop.
    */
  def selfTrain(
      docs: DataFrame, idCol: String, textCol: String, label: Column,
      isLabeled: Column, buckets: Int = 64,
      passes: Int = 10): (PerceptronModel, PerceptronModel) = {
    val teacher = trainPerceptron(
      docs.filter(isLabeled), idCol, textCol, label, buckets, passes)
    // the label arg is unused for pseudo-labeling (pred comes from margins)
    val pseudo = scorePerceptron(
        docs.filter(!isLabeled), idCol, textCol, lit(false), teacher)
      .select(col(idCol), (col("pred") === 1L).as("__lbl"))
    val stage2 = docs.filter(isLabeled)
      .select(col(idCol), col(textCol), label.as("__lbl"))
      .unionByName(
        docs.filter(!isLabeled).select(col(idCol), col(textCol))
          .join(pseudo, Seq(idCol))
          .select(col(idCol), col(textCol), col("__lbl")))
    val student = trainPerceptron(
      stage2, idCol, textCol, col("__lbl"), buckets, passes)
    (teacher, student)
  }

  /** K-fold cross-validated evaluation (the q106 shape): for each fold f,
    * train on every OTHER fold and score fold f's holdout, emitting the
    * integer confusion counts — the eval protocol that decides whether a
    * quality gate is trustworthy before it filters a corpus. `foldCol`
    * must be a deterministic pure function of the row (q106 uses the q43
    * md5-bucket split, so fold membership is reproducible across engines)
    * and must evaluate NON-NULL on every doc — a null fold would silently
    * drop its doc from every holdout, so the collect refuses it instead.
    * Output: (fold, n_docs, tp, fp, tn, fn), one row per fold, all BIGINT.
    */
  def crossValidate(
      docs: DataFrame, idCol: String, textCol: String, label: Column,
      foldCol: Column, folds: Int = 3,
      buckets: Int = 64, passes: Int = 10,
      maxTrainDocs: Int = 100000): DataFrame = {
    require(folds >= 2, s"folds must be >= 2, got $folds")
    val withFold = docs.withColumn("__fold", foldCol)
    // ONE collect of the feature matrix (not one per fold): every fold's
    // training set is a driver-side filter of the same id-ordered rows, so
    // k-fold training costs the same corpus passes as training once
    val (rows, dense) = collectDense(
      withFold, idCol, textCol, label, col("__fold"), buckets, maxTrainDocs)
    val perFold = (0 until folds).map { f =>
      val model = trainFromDense(
        rows.collect { case (id, y, fd) if fd != f => (id, y) },
        dense, buckets, passes)
      scorePerceptron(
          withFold.filter(col("__fold") === f), idCol, textCol, label, model)
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("pred") === 1L && col("label") === 1L, 1L).otherwise(0L)).as("tp"),
          sum(when(col("pred") === 1L && col("label") === -1L, 1L).otherwise(0L)).as("fp"),
          sum(when(col("pred") === -1L && col("label") === -1L, 1L).otherwise(0L)).as("tn"),
          sum(when(col("pred") === -1L && col("label") === 1L, 1L).otherwise(0L)).as("fn"))
        .select(lit(f.toLong).as("fold"), col("n_docs"), col("tp"),
          col("fp"), col("tn"), col("fn"))
    }
    perFold.reduce(_.unionAll(_))
  }
}
