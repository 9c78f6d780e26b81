package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Categorical feature encodings for training sets — the feature-store
  * side of the feature plane (the reference's generate_dataset consumers
  * feed exactly these into tabular models).
  *
  * The flagship is LEAKAGE-SAFE target encoding: the classic tabular
  * feature (replace a category with the target mean over that category)
  * leaks the row's own label into its feature unless each row's encoding
  * is computed OUT-OF-FOLD — from every fold except the row's own (the
  * standard CV-style construction). Same leakage discipline as the
  * purged temporal split (q93) and the group-aware split (q154), applied
  * to feature values instead of split assignment.
  */
object FeatureEncoding {

  /** Out-of-fold smoothed target encoding. Rows are folded by
    * `pmod(xxhash64(id), nFolds)` (deterministic, engine-portable); the
    * target must already be an INTEGER column expression (quantize
    * doubles first — the integer-contract rule), and the encoding for
    * (category, fold) is
    *
    *   enc = (sum_other_folds + alpha * prior) div (cnt_other_folds + alpha)
    *
    * where `prior = global_sum div global_count` — additive smoothing
    * toward the global mean, so a category seen ONLY inside the row's own
    * fold falls back to the prior instead of dividing by zero. All
    * arithmetic is BIGINT (`div` truncation, matched by DuckDB `//`), so
    * the encoding table is bit-reproducible under any partitioning.
    *
    * Returns one row per (category, fold): `n_rows`/`fold_sum` (the
    * fold's own mass), `oof_cnt`/`oof_sum` (the complement used for the
    * encoding) and `enc` — the encoding TABLE, |categories|·nFolds rows.
    * Encoding the training set is then a broadcast join of this table
    * back onto (category, fold) — the table is model-scale by
    * construction, so the join never shuffles the data side.
    *
    * Scale shape: ONE map-side-combined groupBy(cat, fold); the per-cat
    * and global totals re-aggregate the (cat, fold) partials (model
    * scale); no second pass over the data.
    */
  def targetEncodeOof(df: DataFrame, idCol: String, catCol: String,
      targetInt: Column, nFolds: Int, alpha: Long): DataFrame = {
    require(nFolds >= 2, s"need >= 2 folds, got $nFolds")
    require(alpha >= 1, s"alpha must be >= 1 (it is the zero-count rescue), got $alpha")
    val perFold = df.select(
        col(catCol).as("category"),
        pmod(xxhash64(col(idCol).cast("string")), lit(nFolds.toLong)).as("fold"),
        targetInt.cast("long").as("__t"))
      .groupBy(col("category"), col("fold"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__t")).as("fold_sum"))
    val perCat = perFold.groupBy(col("category"))
      .agg(sum(col("n_rows")).as("gcnt"), sum(col("fold_sum")).as("gsum"))
    val g = perCat.agg(sum(col("gcnt")), sum(col("gsum"))).head
    val prior = g.getLong(1) / g.getLong(0) // truncating, like div / DuckDB //
    perFold.join(perCat, Seq("category"))
      .select(col("category"), col("fold"), col("n_rows"), col("fold_sum"),
        (col("gcnt") - col("n_rows")).as("oof_cnt"),
        (col("gsum") - col("fold_sum")).as("oof_sum"))
      .withColumn("enc",
        expr(s"(oof_sum + ${alpha}L * ${prior}L) div (oof_cnt + ${alpha}L)"))
  }

  /** Equal-frequency (quantile) discretization — the other classic
    * tabular encoding: map a numeric feature into `nBins` bins holding
    * ~equal row counts, deterministically BY VALUE (ties share a bin;
    * never NTILE's arbitrary tie split, which is partitioning-dependent).
    * The returned mapping has one row per distinct value: its bin
    * `floor(rows_below * nBins / n)`, plus the census columns.
    *
    * All arithmetic is exact BIGINT on counts, so the mapping is
    * bit-reproducible. Rows with a NULL feature are excluded (encode
    * them with a dedicated indicator, the standard practice).
    *
    * Scale shape: ONE map-side-combined count per distinct value; the
    * running total is a single-task window over the DISTINCT-VALUE
    * table, guarded by the same explicit cardinality budget as the
    * z-order boundary sort (`maxDistinctValues`, default 2^24 — quantize
    * first if the feature is denser); applying the mapping is a join on
    * the value (broadcast when the mapping is small). Never a global
    * sort of the DATA.
    */
  def quantileBins(df: DataFrame, valueInt: Column, nBins: Int,
      maxDistinctValues: Long = 1L << 24): DataFrame = {
    require(nBins >= 2, s"need >= 2 bins, got $nBins")
    val counts = df.select(valueInt.cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
      .persist()
    try {
      val distinct = counts.count()
      require(distinct <= maxDistinctValues,
        s"quantileBins: $distinct distinct values exceed the single-task " +
          s"boundary-sort budget of $maxDistinctValues — quantize the " +
          "feature first or raise maxDistinctValues explicitly")
      val n = counts.agg(sum(col("c"))).head.getLong(0)
      require(n <= Long.MaxValue / nBins,
        s"row count $n * $nBins bins overflows long arithmetic")
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      counts
        .withColumn("rows_below", coalesce(sum(col("c")).over(w), lit(0L)))
        .select(col("v"), col("c").as("n_rows"), col("rows_below"),
          expr(s"(rows_below * $nBins) div ${n}L").as("bin"))
    } finally { counts.unpersist(); () }
  }

  /** Exact nearest-rank percentiles per key group: the value at rank
    * ⌈q/1000·n⌉ (ties share values; NULLs excluded), computed BY VALUE on
    * the per-(key, value) count table — the [[quantileBins]] machinery
    * grouped: one map-side-combined count, one window per key over the
    * DISTINCT-VALUE table (bounded by the value domain, never row count),
    * candidates filtered with exact integer targets `(q·n + 999) div
    * 1000`. Deterministic under any partitioning — no NTILE tie split,
    * no interpolation floats. Returns `(keys…, permille, value)`.
    */
  def exactPercentiles(df: DataFrame, valueInt: Column, keyNames: Seq[String],
      permille: Seq[Int]): DataFrame = {
    require(permille.nonEmpty && permille.forall(q => q >= 1 && q <= 1000),
      s"permille in [1,1000], got $permille")
    import org.apache.spark.sql.expressions.Window
    val keys = keyNames.map(col)
    val counts = df.select((keys :+ valueInt.as("v")): _*)
      .filter(col("v").isNotNull)
      .groupBy((keys :+ col("v")): _*).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(keys: _*).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.withColumn("cum", sum(col("c")).over(w))
    val n = counts.groupBy(keys: _*).agg(sum(col("c")).as("n"))
    cum.join(n, keyNames)
      .select((keys :+ col("v") :+ col("cum") :+ col("n") :+
        explode(array(permille.map(q => lit(q.toLong)): _*)).as("permille")): _*)
      .filter(col("cum") >= expr("(permille * n + 999) div 1000"))
      .groupBy((keys :+ col("permille")): _*)
      .agg(min(col("v")).as("value"))
  }

  /** The hashing trick (Weinberger et al. 2009, feature hashing): map an
    * unbounded categorical feature space into `dims` slots with
    * `idx = xxhash64(feature) mod dims` and an independent sign hash
    * `sign = 1 − 2·(xxhash64(feature ⧺ "#s") mod 2)` (the signed variant
    * that makes collisions cancel in expectation). NO vocabulary — the
    * encoding of a row is a pure map-side function of its feature
    * strings, so a 100 TB corpus encodes in the scan stage with zero
    * joins, zero shuffles, and zero state; collisions are the visible,
    * countable tradeoff (the census every q176-style check hashes).
    *
    * `features` are string columns (convention `name=value`); rows
    * explode to one output row per feature: `(keys…, feature, idx, sign)`.
    * NULL feature strings drop (a missing feature has no slot).
    */
  def hashFeatures(df: DataFrame, features: Seq[Column], dims: Int,
      keyNames: Seq[String] = Nil): DataFrame = {
    require(dims >= 2 && (dims & (dims - 1)) == 0,
      s"dims must be a power of two >= 2, got $dims")
    val f = explode(array(features: _*)).as("feature")
    df.select((keyNames.map(col) :+ f): _*)
      .filter(col("feature").isNotNull)
      .select((keyNames.map(col) :+ col("feature") :+
        pmod(xxhash64(col("feature")), lit(dims.toLong)).as("idx") :+
        (lit(1L) - lit(2L) * pmod(xxhash64(concat(col("feature"), lit("#s"))),
          lit(2L))).as("sign")): _*)
  }
}
