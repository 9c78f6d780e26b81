package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — Spark's shuffle-FREE join mechanism and the
  * storage-level answer to the repeated-join workload (a feature store
  * joining the same entity key every refresh): both sides written
  * `bucketBy(n, key)` hash-partition their FILES by the join key at write
  * time, so a later equi-join reads co-located buckets and the physical
  * plan carries NO Exchange on either side — the join cost at 100 TB is
  * the scan, not a cluster-wide shuffle of both tables. `sortBy(key)`
  * additionally pre-sorts within buckets so SortMergeJoin skips its sort.
  *
  * This is the catalog-table sibling of [[ZOrderLayout]] (which optimizes
  * range pruning) and the VersionedTable family (which optimizes
  * versioned maintenance): same engine, different physical contract.
  * `BucketedLayoutSpec` pins the no-Exchange/no-Sort executed plan.
  *
  * Bucket COUNT is part of the contract: two tables co-locate only with
  * the same count, so pick it once per entity domain (e.g. 2^k ≥ cluster
  * cores) and keep it stable across refreshes.
  */
object BucketedLayout {

  /** Write `df` as a bucketed, in-bucket-sorted parquet table registered
    * in the session catalog under `tableName`, data at `path`.
    */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
      key: String, buckets: Int): Unit = {
    require(buckets >= 1, s"buckets >= 1, got $buckets")
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(tableName)
  }

  /** Equi-join two same-key same-count bucketed tables. With bucketing
    * metadata in the catalog, Catalyst plans this without any Exchange;
    * the result is identical to the plain join of the underlying data.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
