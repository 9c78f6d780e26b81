package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{FeatureStoreQueries, PipelineQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory of SURVEY.md §2 (catalog plane A,
  * relational plane B incl. the point-in-time as-of join B17/B18, managed
  * plane C) plus the training-data-pipeline extensions (dedup, similarity
  * search, text analysis, multimodal) and the storage maintenance ops
  * (q96 retention, q97 optimize) and the data-selection/sampling plane
  * (q98 A-Res weighted sampling, q99 DSIR, q100 int8 SQ ANN, q101
  * edit-distance fuzzy dedup, q102 DSIR resampling, q103 stratified
  * sampling, q104 JL ANN, q105 trained quality classifier, q106 its
  * k-fold CV evaluation, q107 temperature-scaled domain mixing, q108
  * uncertainty sampling, q109 self-training) and the crawl front door
  * (q110 WARC ingest + boilerplate main-text extraction, q111 URL/domain
  * filtering, q112 robots.txt compliance, q113 HTML metadata, q114
  * boilerplate line dedup, q115 the composed crawl pipeline, q116 URL
  * canonicalization + URL-level dedup, q117 CCNet perplexity-bucket
  * selection) and the training-export plane (q118 deterministic shard
  * packing + checksummed manifests, q119 epoch-seeded data order, q120
  * epoch-repetition mixing recipe, q121 manifest diff for incremental
  * publish, q122 domain-calibrated quality gate, q123 the corpus-prep →
  * publish composition, q124 contrastive negative mining). Every
  * query — including the hash-family ops, restated in DuckDB SQL — has
  * an oracle in `oracleSql` (122/122 as of round 11).
  */
object SparkEntry {
  /** Flagship: end-to-end feature-store dataset generation (catalog
    * registration + FV resolution + point-in-time join) on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    FeatureStoreQueries.queries("q17_fs_dataset")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ FeatureStoreQueries.queries ++ PipelineQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ FeatureStoreQueries.oracleSql ++ PipelineQueries.oracleSql
}
