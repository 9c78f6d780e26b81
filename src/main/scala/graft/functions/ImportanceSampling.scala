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
}
