package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Trailing time-range rolling features — the core online-feature
  * engineering primitive (Feast/Tecton-style "sum of value over the last
  * hour per user", evaluated AT EVERY EVENT, not on a fixed grid).
  *
  * Scale shape: ONE shuffle on the entity keys; Spark's range-frame
  * window executor then computes every trailing frame in a single sorted
  * pass per partition (two advancing pointers, O(n), no per-row rescans).
  * Frames are defined on integer epoch-micros, so the boundaries are
  * engine-portable; sums accumulate as exact decimals (order-independent
  * — the cross-engine aggregate lesson). RANGE semantics make ties
  * (equal timestamps) deterministic regardless of partition order: all
  * rows at the frame's edge are in or out together.
  */
object WindowFeatures {

  /** Append `cnt_<name>` and `sum_<name>` columns for each trailing
    * window over `valueCol`, per `keyCols` entity, ordered by
    * `tsMicrosCol` (long epoch micros). Window spec: `(name, micros)` —
    * frame is `[ts - micros, ts]`, both ends inclusive (SQL RANGE
    * PRECEDING..CURRENT ROW semantics).
    */
  def trailing(
      df: DataFrame, keyCols: Seq[String], tsMicrosCol: String, valueCol: String,
      windows: Seq[(String, Long)]): DataFrame =
    windows.foldLeft(df) { case (acc, (name, micros)) =>
      val w = Window.partitionBy(keyCols.map(col): _*)
        .orderBy(col(tsMicrosCol))
        .rangeBetween(-micros, 0)
      acc
        .withColumn(s"cnt_$name", count(lit(1)).over(w))
        .withColumn(s"sum_$name",
          TextFunctions.round4(
            sum(col(valueCol).cast(DecimalType(18, 6))).over(w).cast("double")))
    }

  /** Exponential-decay aggregate with an EXACT power-of-two contract —
    * the feature-store "recency-weighted sum" (decayed click value,
    * fading engagement) without a single float: with half-life
    * `halfLifeDays`, a row aged `a` days carries weight 2^(maxK − a div
    * halfLifeDays) (0 beyond `maxK` half-lives — decayed below the scale
    * resolution), so the returned `decayed` column is the true decayed
    * sum × 2^maxK in exact BIGINT arithmetic, reproducible anywhere.
    * One map-side-combined aggregation per key; `asOfDay` is the
    * pipeline's cutoff date column (usually a literal).
    */
  def decayedSum(df: DataFrame, keyNames: Seq[String], day: Column,
      amountInt: Column, asOfDay: Column, halfLifeDays: Int,
      maxK: Int = 8): DataFrame = {
    require(halfLifeDays >= 1 && maxK >= 1 && maxK <= 30,
      s"need halfLifeDays >= 1 and maxK in [1,30], got $halfLifeDays/$maxK")
    val age = datediff(asOfDay, day).cast("long")
    val k = floor(age.cast("double") / lit(halfLifeDays.toDouble)).cast("long")
    val weight = when(age < 0, lit(0L)) // future rows carry nothing
      .when(k > maxK, lit(0L))
      .otherwise(pow(lit(2.0), (lit(maxK.toLong) - k).cast("double")).cast("long"))
    df.select((keyNames.map(col) :+ (amountInt * weight).as("__wv") :+
        lit(1L).as("__one")): _*)
      .groupBy(keyNames.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), sum(col("__wv")).as("decayed"))
  }
}
