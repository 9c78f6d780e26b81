package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DecimalType, LongType}

/** Interval (range) join: probe rows with a point timestamp against
  * interval rows with [start, end) bounds, NO equi key — the second join
  * family Spark lacks natively (after as-of). Catalyst plans a bare
  * `p.ts >= i.start AND p.ts < i.end` as BroadcastNestedLoopJoin when one
  * side is small and a cartesian product otherwise: O(|probe| × |intervals|)
  * comparisons either way.
  *
  * The scale shape is bucket decomposition (the classic interval-join trick,
  * e.g. Flink's interval join and DuckDB's IEJoin literature): pick a bucket
  * width `b`; an interval registers itself in every bucket its span covers
  * (`sequence(floor(start/b), floor((end−1)/b))` exploded), a probe lands in
  * exactly ONE bucket (`floor(ts/b)`), and the join becomes a plain
  * shuffle/broadcast EQUI-join on the bucket id plus a residual
  * `ts ∈ [start, end)` filter. Each qualifying (probe, interval) pair meets
  * exactly once — in the probe's own bucket — so no dedup pass is needed.
  *
  * Cost: |intervals| inflates by span/b (choose b ≈ the median interval
  * length so the factor is O(1)); the probe side never inflates, which is
  * the side that is 100 TB. The bucket id is an ordinary join key, so
  * Catalyst gives broadcast/AQE/skew handling for free.
  */
object RangeJoin {

  /** @param probe      point side; `probeTs` in epoch micros (LongType) or
    *                    any consistent long unit
    * @param intervals  interval side; `startCol`/`endCol` in the same unit,
    *                    end EXCLUSIVE
    * @param bucketMicros bucket width in the same unit
    * @param how        "inner" or "left" (left keeps probe rows matching no
    *                    interval, with null interval columns)
    * @param maxBucketsPerInterval fail-fast bound on per-interval expansion:
    *                    an interval spanning more buckets than this raises at
    *                    runtime instead of exploding toward sequence()'s 2^31
    *                    element cap. Spans ≫ bucket width mean the bucket
    *                    width was mis-chosen for the data — surface it.
    */
  def intervalJoin(
      probe: DataFrame, probeTs: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketMicros: Long, how: String = "inner",
      maxBucketsPerInterval: Long = 1 << 20): DataFrame = {
    require(bucketMicros > 0, "bucket width must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    require(Seq("inner", "left").contains(how), s"unsupported join type: $how")
    val B = "__graft_bucket"
    val lo = floorDiv(col(startCol), bucketMicros)
    val hi = floorDiv(col(endCol) - 1, bucketMicros)
    // Degenerate intervals (end <= start) cover no point and can never pass
    // the residual; dropping them on the INTERVAL side is exact for both
    // join types (left preserves probe rows, not interval rows) and avoids
    // registering descending sequences in buckets the span doesn't cover.
    // span guard computed in Decimal(38,0): hi - lo in LongType can itself
    // overflow (bucket width 1 with ±infinity sentinel bounds), which would
    // bypass the guard under non-ANSI and throw a cryptic error under ANSI
    val span = hi.cast(DecimalType(38, 0)) - lo.cast(DecimalType(38, 0))
    val buckets = when(span >= maxBucketsPerInterval,
        raise_error(concat(
          lit(s"interval spans more than $maxBucketsPerInterval buckets of width $bucketMicros: ["),
          col(startCol), lit(", "), col(endCol),
          lit(") — choose a wider bucket for this data")))
          .cast(ArrayType(LongType)))
      .otherwise(sequence(lo, hi))
    val iv = intervals.filter(col(endCol) > col(startCol))
      .withColumn(B, explode(buckets))
    val pb = probe.withColumn(B, floorDiv(col(probeTs), bucketMicros))
    val residual = col(probeTs) >= col(startCol) && col(probeTs) < col(endCol)
    how match {
      case "inner" => pb.join(iv, Seq(B), "inner").filter(residual).drop(B)
      case "left" =>
        // left semantics need the residual INSIDE the join condition, so an
        // unmatched probe row survives with nulls instead of being filtered
        pb.as("p").join(iv.as("i"),
            col(s"p.$B") === col(s"i.$B") && residual, "left")
          .drop(B)
    }
  }

  /** Exact floor division on longs, correct for negative operands and for
    * |x| beyond 2^53 (double-based floor loses low bits there, which would
    * bucket a row WRONG and silently drop qualifying pairs — the residual
    * filter can only remove false positives, never recover false negatives).
    * `x - pmod(x, d)` is exactly divisible by d, so the decimal quotient is
    * an exact integer. The subtraction runs in Decimal(38,0), not LongType:
    * within pmod(x,d) of Long.MinValue a long subtraction underflows
    * (ArithmeticException under ANSI, silent wrap + mis-bucketing without),
    * so e.g. a Long.MinValue "-infinity" sentinel start would be rejected or
    * bucketed wrong. pmod itself is safe at the boundary (x % d cannot
    * overflow for d > 0).
    */
  private def floorDiv(x: Column, d: Long): Column = {
    val dec = DecimalType(38, 0)
    ((x.cast(dec) - pmod(x, lit(d)).cast(dec)) / lit(d)).cast("long")
  }
}
