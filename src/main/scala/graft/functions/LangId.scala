package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained character-n-gram language identification — the production
  * replacement for the marker-word scaffold in
  * [[TextFunctions.langId]]: a MULTI-CLASS online averaged perceptron
  * (Collins 2002 generalized to C classes, the standard argmax update)
  * over hashed char 2–4-gram counts, the public fastText/CLD-shaped
  * recipe (char n-grams are the language signal: they capture
  * orthography and morphology without any tokenizer).
  *
  * Architecture mirrors [[QualityClassifier]] (and shares its 100 TB
  * story): the FEATURE PROJECTION is distributed (gram explode →
  * xxhash64 bucket → one map-side-combined count agg over the corpus);
  * the OPTIMIZATION LOOP runs on a driver-collected, CAPPED,
  * id-ordered sample (refuses past `maxTrainDocs`, never truncates);
  * SCORING is scan-only — C hashed-weight literal maps, one HOF fold
  * per class over the gram array, argmax with first-index tie-break,
  * ZERO joins/exchanges.
  *
  * Only the first `maxChars` characters of a document feed the grams —
  * the standard language-ID trade (CLD2 samples bytes): the prefix is
  * plenty of signal, and it bounds per-doc feature cost for BOTH the
  * engine and the DuckDB oracle restatement.
  *
  * Determinism (the oracle story): counts, weights, scores are all
  * INTEGERS, the pass order is id-ascending, ties in the argmax break
  * to the smallest class index — the q126 oracle replays training and
  * prediction bit-for-bit via a `list_reduce` fold with the C weight
  * vectors PACKED INTO ONE BIGINT list (the q105 packed-accumulator
  * workaround for DuckDB 1.0's multi-field lambda bug).
  */
object LangId {

  /** `classes` in index order; `avgWeights(c)` / `avgBias(c)`: per-step
    * sums of the iterates (Collins averaging, unnormalized — argmax-
    * equivalent to the mean).
    */
  case class LangIdModel(
      buckets: Int, maxChars: Int, classes: Seq[String],
      avgWeights: Array[Array[Long]], avgBias: Array[Long], updates: Long)

  /** Char 2–4-grams of the lowercased first `maxChars` chars, built from
    * codegen'd builtins only: one `sequence` of start offsets per width,
    * `transform` to substrings, short tail grams filtered by length.
    * NULL text → empty grams (scores on bias alone, the q105 contract).
    */
  def charGrams(text: Column, maxChars: Int): Column = {
    val t = lower(substring(coalesce(text, lit("")), 1, maxChars))
    val grams = (2 to 4).map { n =>
      // sequence(1, hi) with hi >= 1 always ascends (a hi of
      // length-n+1 <= 0 would DESCEND — Spark fills in step -1 — so the
      // floor at 1 plus the length filter handles short texts)
      filter(
        transform(
          sequence(lit(1), greatest(length(t) - lit(n - 1), lit(1))),
          // substring(Column, Int, Int) only accepts literal positions;
          // Column.substr takes the dynamic start
          i => t.substr(i, lit(n))),
        g => length(g) === n)
    }
    concat(grams: _*)
  }

  /** (__id, __b, __c) hashed gram-count instances — the distributed
    * feature projection shared by training and scoring parity checks.
    */
  private def instances(
      docs: DataFrame, idCol: String, textCol: String,
      buckets: Int, maxChars: Int): DataFrame =
    docs
      .select(col(idCol).as("__id"),
        explode(charGrams(col(textCol), maxChars)).as("__g"))
      .select(col("__id"), pmod(xxhash64(col("__g")), lit(buckets.toLong)).as("__b"))
      .groupBy(col("__id"), col("__b"))
      .agg(count(lit(1)).as("__c"))

  /** Train the multi-class averaged perceptron. `labelCol` must hold
    * values from `classes` (rows with other values are refused — a
    * silently dropped class would skew every remaining boundary).
    * Update on misprediction: `w_y += x, w_pred -= x` (and ±1 on the
    * biases); averaging accumulates after every step.
    */
  def train(
      docs: DataFrame, idCol: String, textCol: String, labelCol: String,
      classes: Seq[String], buckets: Int = 128, passes: Int = 5,
      maxChars: Int = 96, maxTrainDocs: Int = 100000): LangIdModel = {
    require(classes.nonEmpty && classes.distinct == classes,
      s"classes must be non-empty and distinct, got $classes")
    require(buckets >= 2 && buckets <= 4096, s"buckets must be in [2,4096], got $buckets")
    require(passes >= 1 && maxChars >= 4 && maxTrainDocs >= 1,
      s"invalid passes=$passes/maxChars=$maxChars/maxTrainDocs=$maxTrainDocs")
    val idx = classes.zipWithIndex.toMap
    val lblRows = docs.select(col(idCol).as("__id"), col(labelCol).as("__l"))
      .orderBy(col("__id")).limit(maxTrainDocs + 1).collect()
    require(lblRows.length <= maxTrainDocs,
      s"language-ID training set exceeds maxTrainDocs=$maxTrainDocs docs — train on a " +
        "bounded deterministic sample (md5-order limit) or raise the cap; " +
        "refusing rather than truncating or exhausting driver memory.")
    val ordered = lblRows.map { r =>
      val l = r.getString(1)
      require(l != null && idx.contains(l),
        s"label '$l' (doc ${r.get(0)}) is not in classes $classes")
      (r.get(0), idx(l))
    }
    val instRows = instances(docs, idCol, textCol, buckets, maxChars).collect()
    val dense = scala.collection.mutable.HashMap.empty[Any, Array[Long]]
    instRows.foreach { r =>
      val x = dense.getOrElseUpdate(r.get(0), Array.fill(buckets)(0L))
      x(r.getLong(1).toInt) += r.getLong(2)
    }
    val c = classes.size
    val empty = Array.fill(buckets)(0L)
    val w = Array.fill(c)(Array.fill(buckets)(0L))
    val bias = Array.fill(c)(0L)
    val avgW = Array.fill(c)(Array.fill(buckets)(0L))
    val avgBias = Array.fill(c)(0L)
    var updates = 0L
    for (_ <- 1 to passes; (id, y) <- ordered) {
      val x = dense.getOrElse(id, empty)
      // argmax with FIRST-index tie-break (the oracle's CASE order)
      var best = 0; var bestScore = Long.MinValue
      var ci = 0
      while (ci < c) {
        var s = bias(ci); var b = 0
        while (b < buckets) { s += w(ci)(b) * x(b); b += 1 }
        if (s > bestScore) { bestScore = s; best = ci }
        ci += 1
      }
      if (best != y) {
        var b = 0
        while (b < buckets) { w(y)(b) += x(b); w(best)(b) -= x(b); b += 1 }
        bias(y) += 1L; bias(best) -= 1L
        updates += 1L
      }
      ci = 0
      while (ci < c) {
        var b = 0
        while (b < buckets) { avgW(ci)(b) += w(ci)(b); b += 1 }
        avgBias(ci) += bias(ci)
        ci += 1
      }
    }
    LangIdModel(buckets, maxChars, classes, avgW, avgBias, updates)
  }

  /** Predict with a trained model: (idCol, pred_lang, scores one column
    * per class as `score_<lang>`) — all integers, scan-only (the weights
    * ride the [[graft.expressions.LangIdScoresExpr]] closure: no join, no
    * exchange). `pred_lang` is the argmax with first-index tie-break,
    * exactly the trainer's rule. The per-gram hashes are bit-identical to
    * `xxhash64(substring(...))`, so predictions restate in the oracle
    * unchanged (A/B-validated: the HOF spelling and this expression
    * produce byte-equal score columns; the HOF fold measured 2.1 s warm
    * for 5k docs — interpreted CodegenFallback per gram — vs one compiled
    * byte-slice loop here).
    */
  def predict(
      docs: DataFrame, idCol: String, textCol: String,
      model: LangIdModel): DataFrame = {
    // one codegen-participating pass computes every class sum (+bias) —
    // see LangIdScoresExpr for why the built-in HOF spelling (charGrams →
    // aggregate/zip_with fold) is interpreted and ~10× slower per doc
    val sums = graft.expressions.LangIdScoresExpr.scores(
      coalesce(col(textCol), lit("")),
      model.avgWeights, model.avgBias, model.buckets, model.maxChars)
    val scoreCols = model.classes.indices.map { ci =>
      element_at(col("__sums"), ci + 1).as(s"__s$ci")
    }
    val withScores = docs
      .withColumn("__sums", sums)
      .select(col(idCol) +: scoreCols: _*)
    // first-index-wins argmax as a literal CASE chain over C columns
    val pred = model.classes.indices.init.foldRight(
        lit(model.classes.last): Column) { (ci, rest) =>
      val beatsLater = model.classes.indices.drop(ci + 1)
        .map(cj => col(s"__s$ci") >= col(s"__s$cj"))
        .reduce(_ && _)
      when(beatsLater, lit(model.classes(ci))).otherwise(rest)
    }
    withScores.select(
      col(idCol) +: pred.as("pred_lang") +:
        model.classes.zipWithIndex.map { case (l, ci) =>
          col(s"__s$ci").as(s"score_$l") }: _*)
  }
}
