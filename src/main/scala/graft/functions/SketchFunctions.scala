package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.functions._

import graft.expressions.{BloomFilterAgg, BloomMightContain, HeavyHittersAgg}

/** Sketch-backed aggregations for unbounded key domains.
  *
  * The built-in mergeable sketches (HLL++ cardinality, quantile summaries —
  * q61) answer "how many / how distributed"; the Misra–Gries summary here
  * answers "WHICH keys dominate" — vocabulary building, hot-key detection,
  * top-token stats over a 100 TB corpus where an exact global
  * `groupBy(token).count` would shuffle billions of distinct keys.
  *
  * Reference anchor: the reference's aggregation plane is
  * exact-SQL-delegated (dbt models over the warehouse); this is the
  * beyond-reference scale path for frequency statistics (SURVEY §8.4).
  */
object SketchFunctions {

  /** Misra–Gries heavy-hitters sketch aggregate: at most `capacity`
    * (item, est_count) counters, mergeable map-side, with the guarantee
    * est <= true <= est + N/(capacity+1). Returns
    * `array<struct<item:string, est_count:bigint>>` sorted by est desc.
    */
  def heavyHittersSketch(item: Column, capacity: Int): Column =
    GraftBridge.column(
      HeavyHittersAgg(GraftBridge.expression(item), capacity).toAggregateExpression())

  /** Bloom-filter aggregate over a string column: mergeable bitset state
    * (numBits/8 bytes), built map-side, bit-identical regardless of
    * partitioning (merge is word-wise OR). Probe the result with
    * [[bloomMightContain]] — same double-hash scheme, no false negatives.
    */
  def bloomAgg(item: Column, numBits: Long, numHashes: Int = 5): Column =
    GraftBridge.column(
      BloomFilterAgg(GraftBridge.expression(item), numBits, numHashes)
        .toAggregateExpression())

  /** Map-side membership probe against [[bloomAgg]] bytes (typically a
    * collected literal — a few MB standing in for a key set too large to
    * broadcast raw).
    */
  def bloomMightContain(bloom: Column, item: Column): Column =
    GraftBridge.column(BloomMightContain(
      GraftBridge.expression(bloom), GraftBridge.expression(item)))

  /** EXACT distributed heavy hitters — the two-pass production pattern:
    *
    *   pass 1: one map-side-combined MG sketch per group (shuffle carries
    *           one <= capacity-entry sketch per partition per group, never
    *           the item stream) + the exact group total N;
    *   pass 2: broadcast the <= capacity candidates back, exact-count ONLY
    *           those keys (partial-agg shuffle of <= capacity keys per
    *           group), keep items with  n_occurrences * denom > N.
    *
    * Because the threshold N/denom is >= the sketch's maximum undercount
    * N/(capacity+1) (enforced: denom <= capacity+1), pass 1 can only
    * over-generate candidates — so the output is EXACTLY the set of items
    * with frequency > N/denom, deterministic regardless of partitioning or
    * merge order, at two scans and two tiny shuffles.
    *
    * `items` must have one row per item occurrence (`itemCol` string),
    * plus the grouping columns.
    */
  def exactHeavyHitters(
      items: DataFrame,
      groupCols: Seq[String],
      itemCol: String,
      capacity: Int,
      denom: Int): DataFrame = {
    require(denom >= 2 && denom <= capacity + 1,
      s"threshold denom must be in [2, capacity+1] for the MG guarantee to " +
        s"cover the threshold (got denom=$denom, capacity=$capacity)")
    val g = groupCols.map(col)
    val sketchPass = items
      .groupBy(g: _*)
      .agg(
        heavyHittersSketch(col(itemCol), capacity).as("hh"),
        count(lit(1)).as("n_total"))
    val candidates = sketchPass
      .select(g ++ Seq(explode(col("hh")).as("e"), col("n_total")): _*)
      .select(g ++ Seq(col("e.item").as(itemCol), col("n_total")): _*)
    items
      .join(broadcast(candidates), groupCols :+ itemCol)
      .groupBy(g ++ Seq(col(itemCol), col("n_total")): _*)
      .agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") * denom > col("n_total"))
      .select(g ++ Seq(col(itemCol), col("n_occurrences"), col("n_total")): _*)
  }
}
