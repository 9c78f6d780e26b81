package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection: hashed-token importance weights
  * ("Data Selection for Language Models via Importance Resampling",
  * Xie et al., NeurIPS 2023 — the public recipe behind targeted pre-training
  * mixes). A document's weight is the log-likelihood ratio of its hashed
  * bag-of-tokens under a TARGET distribution (the high-quality slice you
  * want more of) vs the RAW distribution (the whole crawl):
  *
  *   score(d) = Σ_{t ∈ tokens(d)} [ ln p_target(bucket(t)) − ln p_raw(bucket(t)) ]
  *
  * with `bucket(t) = xxhash64(t) mod B` and add-one smoothing on both
  * unigram models. High scores → "looks like the target corpus"; feed the
  * scores to [[Sampling.weightedSample]] (importance RESAMPLING) or gate on
  * a threshold.
  *
  * Scale shape (100 TB): the only data-scale passes are the token explode
  * and two map-side-combined bucket counts; the model itself is B rows
  * (buckets, default 1024) — a broadcast join onto token instances, then
  * one per-doc sum agg. No all-pairs anything, no driver-side data; the
  * hashed projection is exactly why DSIR scales where KenLM-style scoring
  * needs a trained model per shard.
  *
  * Determinism: bucket ids ride on `xxhash64` (seed 42, restated bit-for-bit
  * in the DuckDB oracle via [[graft.queries.DuckDbXxHash64]]); the final
  * score is rounded to 6 dp to absorb partial-aggregation float noise, the
  * same contract as the cosine operators.
  */
object ImportanceSampling {

  /** Per-document DSIR score. `isTarget` marks the rows that define the
    * target distribution (they are still scored, like every other row).
    * Documents with zero tokens are dropped (no evidence either way).
    */
  def dsirScores(
      docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val b = lit(buckets.toLong)
    val inst = docs
      .select(col(idCol).as("__id"), isTarget.as("__tgt"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("__w"))
      .select(col("__id"), col("__tgt"),
        pmod(xxhash64(col("__w")), b).as("__b"))
    // raw model: every token instance; target model: the target slice.
    // Both are one map-side-combined count agg over at most B groups.
    val raw = inst.groupBy(col("__b")).agg(count(lit(1)).as("__cr"))
    val tgt = inst.filter(col("__tgt")).groupBy(col("__b")).agg(count(lit(1)).as("__ct"))
    val totals = inst.agg(
      count(lit(1)).as("__tr"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("__tt"))
    // model table: B rows max — broadcast everywhere it joins
    val model = raw
      .join(tgt, Seq("__b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("__b"),
        (log((coalesce(col("__ct"), lit(0L)) + lit(1L)).cast("double") / (col("__tt") + b).cast("double"))
          - log((col("__cr") + lit(1L)).cast("double") / (col("__tr") + b).cast("double"))).as("__lr"))
    inst
      .join(broadcast(model), Seq("__b"))
      .groupBy(col("__id"))
      .agg(round(sum(col("__lr")), 6).as("dsir_score"))
      .withColumnRenamed("__id", idCol)
  }

  /** DoReMi domain reweighting (Xie et al., "DoReMi: Optimizing Data
    * Mixtures Speeds Up Language Model Pretraining", NeurIPS 2023):
    * Group-DRO exponentiated-gradient ascent on domain weights, driven by
    * per-domain EXCESS loss — how much worse a small proxy model does
    * than a stronger reference model — so hard-but-learnable domains gain
    * weight and saturated/noise domains lose it. The proxy/reference
    * losses here come from the bigram-LM plane (two [[NgramLm]] scorings
    * of different training capacity) rather than a transformer pair; the
    * weight LOOP is DoReMi's, step for step over md5-hashed batches:
    *
    *   x(d,t) = clip(mean excess loss of domain d in batch t)
    *   w      ← renormalize(w_d · exp(η · x(d,t)))
    *   w      ← (1−δ)·w + δ·uniform
    *
    * Determinism (the integer-fold contract): per-doc excess lands on the
    * round4 integer grid (1e-4 units, `floor(·1e4+0.5)`), cell means are
    * floor divisions, exp() is quantized to integer billionths
    * IMMEDIATELY (the q107 pow precedent — one float op, then integers),
    * and the state renormalizes in exact BigInt arithmetic. Any engine
    * can replay the loop as an integer fold.
    *
    * Scale shape: the data-scale work is the two upstream LM scorings
    * plus ONE groupBy(domain, batch) here; the fold itself runs over the
    * D×B cell table on the driver — model scale by construction (the
    * mixRecipe quota-collect precedent). Returns one row per domain:
    * (domainCol, weight9) in integer billionths, Σ ≈ 1e9.
    */
  def doremiWeights(
      proxyScored: DataFrame, refScored: DataFrame, domains: DataFrame,
      idCol: String, domainCol: String, pplCol: String = "log_ppl",
      batches: Int = 8, eta: Double = 0.5, clipQ: Long = 20000L,
      smoothNum: Long = 1L, smoothDen: Long = 10L): DataFrame =
    doremiWeightsScored(
      proxyScored.select(col(idCol).as("__sid"), col(pplCol).as("__sp"))
        .join(refScored.select(col(idCol).as("__sid"), col(pplCol).as("__sr")),
          Seq("__sid"))
        .select(col("__sid").as(idCol), col("__sp").as("__p"), col("__sr").as("__r")),
      domains, idCol, domainCol, "__p", "__r",
      batches, eta, clipQ, smoothNum, smoothDen)

  /** [[doremiWeights]] over a SINGLE frame carrying both losses — the
    * fused-scoring path ([[NgramLm.scoreDocsDual]]: one bigram explode
    * for both models instead of two full scoring chains).
    */
  def doremiWeightsScored(
      scored: DataFrame, domains: DataFrame,
      idCol: String, domainCol: String,
      proxyCol: String, refCol: String,
      batches: Int = 8, eta: Double = 0.5, clipQ: Long = 20000L,
      smoothNum: Long = 1L, smoothDen: Long = 10L): DataFrame = {
    require(batches >= 1, s"batches must be >= 1, got $batches")
    require(eta > 0, s"eta must be positive, got $eta")
    require(smoothDen > smoothNum && smoothNum >= 0, "need 0 <= smoothNum < smoothDen")
    val sc = scored.select(col(idCol).as("__id"),
      col(proxyCol).as("__p"), col(refCol).as("__r"))
    val d = domains.select(col(idCol).as("__id"), col(domainCol).as("__dom"))
    // per-doc excess on the integer 1e-4 grid; scores are round4 values,
    // so floor(x*1e4+0.5) recovers the exact grid index in every engine
    val eq = greatest(
      (floor(col("__p") * 1e4 + 0.5) - floor(col("__r") * 1e4 + 0.5)).cast("long"),
      lit(0L))
    val cells = sc.join(d, Seq("__id"))
      .select(col("__dom"),
        pmod(xxhash64(col("__id").cast("string")), lit(batches.toLong)).as("__t"),
        eq.as("__eq"))
      .groupBy(col("__dom"), col("__t"))
      .agg(count(lit(1)).as("__n"), sum(col("__eq")).as("__sq"))
      .collect()
      .map(row => (row.getString(0), row.getLong(1)) ->
        (row.getLong(2), row.getLong(3))).toMap
    val domsRaw = cells.keys.map(_._1).toSeq.distinct
    require(!domsRaw.contains(null),
      s"$domainCol carries NULL values — assign an explicit 'unknown' domain " +
        "before reweighting (a NULL slot has no stable sort position)")
    val doms = domsRaw.sorted
    require(doms.nonEmpty, "no scored documents — nothing to reweight")
    val u = 1000000000L / doms.size
    var w: Seq[BigInt] = Seq.fill(doms.size)(BigInt(u))
    for (t <- 0L until batches.toLong) {
      val xs = doms.map(dm => cells.get((dm, t))
        .map { case (n, sq) => math.min(sq / n, clipQ) }.getOrElse(0L))
      val ps = w.zip(xs).map { case (wd, x) =>
        wd * BigInt(math.floor(math.exp(eta * x / 10000.0) * 1e9 + 0.5).toLong) }
      val s = ps.sum
      w = ps.map { pd =>
        val wn = pd * 1000000000L / s
        (wn * (smoothDen - smoothNum) + BigInt(u) * smoothNum) / smoothDen
      }
    }
    val spark = domains.sparkSession
    import spark.implicits._
    doms.zip(w.map(_.toLong)).toDF(domainCol, "weight9")
  }
}
