package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Feature-monitoring plane: column profiling and train/serve drift — the
  * operational layer every production feature store runs next to its
  * materializations (reference anchor: the feature-view lifecycle; drift
  * monitoring is the standard companion, cf. PSI from credit-scoring
  * practice and the Evidently/TFDV formulations).
  *
  * Scale shape: everything here is one map-side-combined aggregation per
  * table — profiles and histograms are mergeable per-partition state, so
  * the shuffle carries per-column/per-bucket partials, never rows.
  */
object Monitoring {

  /** Per-column profile over numeric (long/double-castable) columns: one
    * output row per column with exact counts and exact-decimal mean
    * (order-independent — the cross-engine aggregate lesson). Shape:
    * (column, n_rows, n_nulls, n_distinct, min_v, max_v, mean_v).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
        count_distinct(col(c)).as("n_distinct"),
        min(col(c).cast("double")).as("min_v"),
        max(col(c).cast("double")).as("max_v"),
        (sum(col(c).cast(DecimalType(28, 6))).cast("double") / count(col(c)))
          .as("mean_v"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_v"), col("max_v"),
          TextFunctions.round4(col("mean_v")).as("mean_v"))
    }.reduce(_ unionAll _)

  /** Fixed-width histogram bucket index for `c` over [minV, maxV] —
    * map-side, Decimal-exact (no double division), edge values clamped
    * into the end buckets.
    */
  def bucketOf(c: Column, minV: Double, maxV: Double, nBuckets: Int): Column = {
    val span = math.max(java.lang.Math.ulp(0.0), maxV - minV)
    // doubles here are values, not row counts: bucket boundaries are a
    // modeling choice; the COUNTS per bucket stay exact integers
    val raw = floor((c.cast("double") - lit(minV)) / lit(span) * lit(nBuckets)).cast("long")
    greatest(lit(0L), least(raw, lit(nBuckets.toLong - 1)))
  }

  /** Per-bucket counts of `valueCol` for each split in `splitCol` — the
    * exact, oracle-checkable drift evidence (one agg; mergeable).
    */
  def driftHistogram(
      df: DataFrame, splitCol: String, valueCol: String,
      minV: Double, maxV: Double, nBuckets: Int): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(splitCol).as("split"),
        bucketOf(col(valueCol), minV, maxV, nBuckets).as("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Population Stability Index between two splits of `valueCol`:
    * PSI = Σ_buckets (p_b − q_b) · ln(p_b / q_b), with Laplace smoothing so
    * empty buckets stay finite. One aggregation + a buckets-sized reduce.
    * Conventional reading: < 0.1 stable, 0.1–0.25 moderate shift, > 0.25
    * action required.
    */
  def psi(
      df: DataFrame, splitCol: String, baseSplit: String, compareSplit: String,
      valueCol: String, minV: Double, maxV: Double, nBuckets: Int): DataFrame = {
    val hist = driftHistogram(df, splitCol, valueCol, minV, maxV, nBuckets)
      .groupBy(col("bucket"))
      .agg(
        sum(when(col("split") === baseSplit, col("n")).otherwise(0L)).as("n_base"),
        sum(when(col("split") === compareSplit, col("n")).otherwise(0L)).as("n_cmp"))
    val tot = hist.agg(sum(col("n_base")), sum(col("n_cmp"))).head
    val (nb, nc) = (tot.getLong(0).toDouble, tot.getLong(1).toDouble)
    val eps = 1.0 // Laplace count smoothing per bucket
    val p = (col("n_base") + lit(eps)) / lit(nb + eps * nBuckets)
    val q = (col("n_cmp") + lit(eps)) / lit(nc + eps * nBuckets)
    hist.select(((p - q) * log(p / q)).as("__term"))
      .agg(TextFunctions.round4(sum(col("__term"))).as("psi"))
      .select(lit(valueCol).as("column"), lit(baseSplit).as("base"),
        lit(compareSplit).as("compare"), col("psi"))
  }
}
