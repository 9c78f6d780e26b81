package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Purged time-series K-fold assignment with an embargo band — the
  * temporal-leakage guard for model selection over event data (López de
  * Prado, *Advances in Financial Machine Learning*, 2018, ch. 7: purged
  * K-fold CV). The content-hash split (q43) is the right tool for i.i.d.
  * corpora; for FEATURE data keyed by event time it leaks, because rows
  * adjacent in time share information across the train/validation
  * boundary — the same failure mode the point-in-time as-of join (§2.B17)
  * exists to prevent at serving time. Reference-surface context: the
  * reference's `generate_dataset` workflow leaves CV splitting to the
  * caller; at 100 TB the split itself must be a distributed operator.
  *
  * Semantics, for fold k of n over the closed event-time range
  * [lo, hi] (micros): the range is cut into n ceil-width blocks;
  * a row is `valid` for fold k when its timestamp falls inside block k,
  * `purged` when it falls within `embargoMicros` of either side of block
  * k (too correlated with the validation block to train on), `train`
  * otherwise. Every row gets a role FOR EVERY fold — callers filter
  * `fold = k` to train one fold, and Catalyst prunes the broadcast fold
  * table to that single row before the join.
  *
  * Scale shape: one scalar min/max aggregation (a 2-long driver result,
  * not a collect of data), then a stateless broadcast cross-join against
  * the n-row fold table — map-only, no shuffle of the input; the count
  * rollup underneath q93 partial-aggregates map-side. Nothing in the
  * plan depends on corpus size beyond the linear scan.
  */
object TemporalSplit {

  /** Row-level (fold, role) assignment; output = input columns +
    * `fold` (long, 0..nFolds-1) + `role` ('train'|'valid'|'purged'),
    * nFolds rows per input row.
    */
  def assignPurgedFolds(
      df: DataFrame, tsCol: String, nFolds: Int,
      embargoMicros: Long): DataFrame = {
    require(nFolds >= 2, s"nFolds must be >= 2, got $nFolds")
    require(embargoMicros >= 0, s"embargoMicros must be >= 0, got $embargoMicros")
    val reserved = Seq("fold", "role", "__fs", "__fe")
    val clash = df.columns.filter(c => reserved.contains(c))
    require(clash.isEmpty,
      s"assignPurgedFolds: input columns ${clash.mkString(", ")} collide with " +
        s"output/internal names (${reserved.mkString(", ")}) — rename them first")
    val spark = df.sparkSession
    val us = unix_micros(col(tsCol))
    val mm = df.agg(min(us).as("lo"), max(us).as("hi")).head
    require(!mm.isNullAt(0), "assignPurgedFolds: empty input or all-null timestamps")
    val lo = mm.getLong(0)
    val hiEx = mm.getLong(1) + 1 // exclusive upper bound
    val width = math.max(1L, (hiEx - lo + nFolds - 1) / nFolds) // ceil
    import spark.implicits._
    val folds = (0 until nFolds).map { k =>
      val fs = lo + k.toLong * width
      (k.toLong, fs, math.min(hiEx, fs + width))
    }.toDF("fold", "__fs", "__fe")
    // When nFolds exceeds the distinct-time-unit range, ceil width leaves
    // trailing folds with an EMPTY validation block (fs >= fe); such a fold
    // must not purge anything — every row is train, rather than silently
    // losing rows to an embargo band around a phantom block.
    val nonEmpty = col("__fs") < col("__fe")
    df.crossJoin(broadcast(folds))
      .withColumn("role",
        when(nonEmpty && us >= col("__fs") && us < col("__fe"), "valid")
          .when(nonEmpty && us >= col("__fs") - embargoMicros &&
            us < col("__fe") + embargoMicros, "purged")
          .otherwise("train"))
      .drop("__fs", "__fe")
  }
}
