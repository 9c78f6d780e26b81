package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.storage.VersionedTable

/** Training-export plane: the last mile of a pre-training data pipeline —
  * carve the curated corpus into fixed-token-budget shards, stamp each
  * shard with an order-independent content checksum, and derive the
  * per-epoch read order — all as pure functions of the data, so a re-run
  * on a different partitioning (or a different engine) reproduces the
  * same shards and the same order bit-for-bit.
  *
  * Scale shape (the 100 TB story): the corpus is first hash-bucketed by
  * `xxhash64(id)` — the ONE full-data exchange any deterministic packing
  * needs — and every subsequent step (running-total packing, manifest
  * aggregation, epoch ranking) is per-bucket, so parallelism is the
  * bucket count. `buckets` is the sizing lever: pick it so one bucket
  * (corpus/buckets bytes) fits a single task's external sort — 1024
  * buckets at 100 TB is ~100 GB/bucket; the tests' 8 keeps the oracle
  * tractable. Within a bucket the running token total is inherently
  * sequential (that is what "packed in a defined order" means), which is
  * why the bucketing exists at all: it bounds the sequential extent
  * without giving up determinism, the same trade the md5-ordered mixing
  * draws in [[Sampling]] make.
  */
object ShardExport {

  /** Deterministic shard assignment: bucket = xxhash64(id) mod `buckets`,
    * then docs packed in `(md5(id), id)` order (a reproducible
    * pseudo-random permutation) into consecutive shards of
    * `budgetTokens` tokens — `shard_seq = cum_before div budget`, so a
    * shard overshoots its budget by at most one document (the greedy
    * packing contract of [[Sampling.tokenBudgetSample]]).
    *
    * Returns one row per doc: (idCol, n_tokens, bucket, cum_before,
    * shard_seq). NULL/all-whitespace text counts 0 tokens and rides
    * along (it lands in a shard but consumes no budget).
    */
  def shardAssign(df: DataFrame, idCol: String, textCol: String,
      buckets: Int, budgetTokens: Long): DataFrame =
    assignCore(df, idCol,
      coalesce(TextFunctions.tokenCount(col(textCol)).cast("long"), lit(0L)),
      buckets, budgetTokens, carry = Seq.empty)

  /** [[shardAssign]] packing by a PRECOMPUTED weight column instead of the
    * whitespace token count — the tokenizer-aware budget path: training
    * consumers budget in MODEL tokens (BPE / unigram-LM piece counts,
    * [[BpeTokenizer.encodeTokens]] / [[UnigramLm]]), and a shard cut on
    * whitespace tokens misses the packing target by the corpus's
    * subwords-per-word ratio. Same packing contract (md5 order,
    * cumulative budget, overshoot ≤ 1 doc); NULL weights count 0.
    */
  def shardAssignBy(df: DataFrame, idCol: String, weightCol: String,
      buckets: Int, budgetTokens: Long): DataFrame =
    assignCore(df, idCol, coalesce(col(weightCol).cast("long"), lit(0L)),
      buckets, budgetTokens, carry = Seq.empty)

  /** [[shardAssign]] core with the per-doc weight factored out as an
    * expression and pass-through columns (`carry`) kept on every row —
    * the physical writer needs the document text to travel with its
    * assignment without a second join back to the corpus (at 100 TB a
    * re-join on id is a full extra shuffle; here the text simply rides the
    * one bucket exchange the packing already pays).
    */
  private def assignCore(df: DataFrame, idCol: String, tokenExpr: Column,
      buckets: Int, budgetTokens: Long, carry: Seq[String]): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val base = df.select(col(idCol) +: carry.map(col) :+
      tokenExpr.as("n_tokens"): _*)
      .withColumn("bucket",
        pmod(xxhash64(col(idCol).cast("string")), lit(buckets.toLong)))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("shard_seq",
        expr(s"cum_before div CAST($budgetTokens AS BIGINT)"))
  }

  /** Pretraining token-stream packing — the GPT-style concat-and-cut:
    * documents are concatenated in deterministic md5 order and the
    * stream is cut every `windowTokens` tokens, so a document can START
    * mid-window and SPILL across window boundaries. This is the other
    * half of the packing plane: [[shardAssign]]/[[shardAssignBy]] keep
    * documents ATOMIC (shard budgets, overshoot ≤ 1 doc); here the
    * WINDOW is atomic and documents split — the shape causal-LM
    * pretraining actually trains on (every window exactly full except
    * each stream's tail).
    *
    * Output: one row per (document, window) span — `bucket`,
    * `window_id` (per-bucket, 0-based), the doc id, `span_start`
    * (offset of the span INSIDE the window), `span_len`, and `doc_from`
    * (offset of the span inside the DOCUMENT) — enough for a writer to
    * materialize windows byte-for-byte or build attention-reset masks
    * at document boundaries. Zero-token docs are dropped (they occupy
    * no stream positions).
    *
    * Scale shape: real pipelines shard the token stream into B
    * independent streams exactly like this (`bucket` =
    * xxhash64(id) mod B) — ONE exchange on bucket, the running offset
    * is a per-bucket window cumsum (one task per bucket; size B to
    * taste), and the span explode adds only `windows crossed` extra
    * rows (total rows = docs + windows, never tokens). Everything is
    * integer arithmetic on token counts — no text moves.
    */
  def packTokenStream(df: DataFrame, idCol: String, textCol: String,
      buckets: Int, windowTokens: Long): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(windowTokens > 0, s"windowTokens must be positive, got $windowTokens")
    val c = windowTokens
    val base = df.select(col(idCol),
        coalesce(TextFunctions.tokenCount(col(textCol)).cast("long"), lit(0L))
          .as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("bucket",
        pmod(xxhash64(col(idCol).cast("string")), lit(buckets.toLong)))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("start_off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("end_off", col("start_off") + col("n_tokens"))
      .withColumn("window_id", explode(sequence(
        expr(s"start_off div CAST($c AS BIGINT)"),
        expr(s"(end_off - 1) div CAST($c AS BIGINT)"))))
      .withColumn("win_lo", col("window_id") * lit(c))
      .select(col("bucket"), col("window_id"), col(idCol),
        (greatest(col("start_off"), col("win_lo")) - col("win_lo"))
          .as("span_start"),
        (least(col("end_off"), col("win_lo") + lit(c))
          - greatest(col("start_off"), col("win_lo"))).as("span_len"),
        (greatest(col("start_off"), col("win_lo")) - col("start_off"))
          .as("doc_from"))
  }

  /** Per-shard manifest over a [[shardAssign]] output: doc count, token
    * sum, first doc, and an ORDER-INDEPENDENT content checksum —
    * `bit_xor(xxhash64(id:n_tokens))` — so two exports of the same data
    * produce byte-identical manifests no matter how tasks interleaved,
    * and a reader can verify a shard without re-sorting it. XOR (not a
    * wrapping sum) because it is overflow-free under ANSI mode and
    * self-inverse: a corrupted manifest localizes to the damaged shard.
    */
  def shardManifest(assigned: DataFrame, idCol: String): DataFrame =
    assigned.groupBy(col("bucket"), col("shard_seq"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("shard_tokens"),
        expr(s"bit_xor(xxhash64(concat(cast($idCol as string), ':', " +
          "cast(n_tokens as string))))").as("checksum"),
        min(col(idCol)).as("first_doc"))

  /** Structural diff of two [[shardManifest]] tables — the incremental-
    * publish read of the checksum design: a re-export only re-uploads the
    * shards this diff names. `added` = shard exists only in `next`,
    * `removed` = only in `prev`, `changed` = same (bucket, shard_seq) but
    * a different (checksum, n_docs, shard_tokens) triple. The checksum
    * covers (id, n_tokens) per doc — membership and sizes — so the diff
    * sees adds/removes/resizes; a same-length in-place text edit needs a
    * content-hash manifest variant (deliberately out of scope: the
    * manifest is the PACKING's signature, and the packing is a pure
    * function of (id, n_tokens)).
    *
    * Scale shape: manifests are corpus/budget rows (model-scale next to
    * the corpus); the full-outer join is co-keyed on (bucket, shard_seq)
    * and never touches document data. Because packing is cumulative
    * within a bucket, one resized doc legitimately re-cuts every later
    * shard in its bucket — the diff reports that cascade honestly (it is
    * exactly what a publisher must re-upload), and is why the streaming
    * exporter ([[graft.streaming.ShardStream]]) packs per wave instead of
    * re-cutting.
    */
  def manifestDiff(prev: DataFrame, next: DataFrame): DataFrame = {
    val keys = Seq("bucket", "shard_seq")
    val p = prev.select(col("bucket"), col("shard_seq"),
      struct(col("checksum"), col("n_docs"), col("shard_tokens")).as("__p"))
    val n = next.select(col("bucket"), col("shard_seq"),
      struct(col("checksum"), col("n_docs"), col("shard_tokens")).as("__n"))
    p.join(n, keys, "full_outer")
      .withColumn("status",
        when(col("__p").isNull, lit("added"))
          .when(col("__n").isNull, lit("removed"))
          .when(col("__p") =!= col("__n"), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .select(col("bucket"), col("shard_seq"), col("status"))
  }

  /** First `k` positions of the epoch-`epochSeed` training order without
    * a global sort: rank docs inside each xxhash64 bucket by
    * `(md5(seed:id), id)` — a fresh pseudo-random permutation per seed —
    * and interleave buckets round-robin:
    * `epoch_pos = (bucket_rank - 1) * buckets + bucket`.
    *
    * The per-bucket rank bound `ceil(k / buckets)` is a LITERAL, so the
    * window plans as a WindowGroupLimit with a PARTIAL pre-trim (the
    * q103 shape): each map partition forwards at most that many rows per
    * bucket and no task ever sorts a full bucket to answer a head-of-
    * order read. Streaming the WHOLE epoch order is the degenerate
    * k = corpus case — there the full per-bucket sort is the work being
    * asked for, and `buckets` is again the parallelism lever.
    */
  def epochOrder(df: DataFrame, idCol: String, epochSeed: String,
      buckets: Int, k: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(k > 0, s"k must be positive, got $k")
    val perBucket = (k + buckets - 1) / buckets
    // a deep head (k/B past the optimizer's windowGroupLimitThreshold,
    // default 1000) would silently drop the pre-trim rewrite — raise it
    // to cover the literal bound, the Sampling ops' own guard
    Sampling.ensureGroupLimitThreshold(df, perBucket.toLong)
    val ord = Seq(
      md5(concat(lit(epochSeed + ":"), col(idCol).cast("string"))),
      col(idCol))
    df.select(col(idCol))
      .withColumn("bucket",
        pmod(xxhash64(col(idCol).cast("string")), lit(buckets.toLong)))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("bucket")).orderBy(ord: _*)))
      .filter(col("__rk") <= lit(perBucket))
      .withColumn("bucket_rank", col("__rk").cast("long"))
      .withColumn("epoch_pos",
        (col("bucket_rank") - 1L) * lit(buckets.toLong) + col("bucket"))
      .filter(col("epoch_pos") < lit(k.toLong))
      .select(col(idCol), col("bucket"), col("bucket_rank"), col("epoch_pos"))
  }

  /** Epoch-repetition mixing recipe (the public pre-training data-recipe
    * shape: per-domain target weights realized as whole-corpus epochs
    * plus one greedy partial epoch). For each domain in `weights`:
    * desired = totalTokens * w / Σw (integer floor), full epochs =
    * desired div natural-tokens, remainder = desired mod natural-tokens
    * drawn as the md5-order greedy prefix via
    * [[Sampling.tokenBudgetSample]] — so the manifest is exact to the
    * token (each domain's partial epoch overshoots by at most one doc,
    * the greedy contract) and pure integer arithmetic end to end.
    *
    * Returns one row per (domain, epoch): epochs 0..full-1 are whole
    * passes (all docs, natural token total); epoch = full is the partial
    * prefix (absent when the remainder is 0 or rounds to no docs).
    *
    * Scale shape: the per-domain natural totals are a model-scale
    * aggregate (one row per weighted domain) collected to the driver to
    * turn data-dependent remainders into the LITERAL budgets the
    * group-limit pre-trim in tokenBudgetSample needs — the q107 quota
    * pattern. Full-epoch rows are driver-built literals (#domains ×
    * epochs rows); only the partial-epoch draw touches the corpus again.
    */
  def mixRecipe(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, weights: Map[String, Long],
      totalTokens: Long): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.values.forall(_ > 0), "weights must be positive")
    require(totalTokens > 0, s"totalTokens must be positive, got $totalTokens")
    val weightSum = weights.values.sum
    mixApply(df, idCol, textCol, groupCol, weights.keySet,
      d => totalTokens * weights(d) / weightSum)
  }

  /** [[mixRecipe]] with ABSOLUTE per-group token budgets instead of
    * weights-of-a-total — the application step for allocations computed
    * elsewhere (e.g. [[Sampling.unimaxAllocation]]'s waterfilling).
    * Same output contract: one row per (group, epoch).
    */
  def mixApplyBudgets(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, budgets: Map[String, Long]): DataFrame = {
    require(budgets.nonEmpty, "budgets must be non-empty")
    require(budgets.values.forall(_ >= 0), "budgets must be >= 0")
    mixApply(df, idCol, textCol, groupCol, budgets.keySet, budgets)
  }

  /** Shared epoch-recipe application: per group with a nonzero natural
    * token count, `budgetOf(group)` tokens land as `budget div nat` FULL
    * epochs plus an md5-order partial epoch of the remainder (via
    * [[Sampling.tokenBudgetSample]]'s greedy prefix). The natural census
    * is ONE corpus aggregation collected at model scale (a row per
    * group); epochs materialize as counts, never as row duplication.
    */
  private def mixApply(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, groups: Set[String],
      budgetOf: String => Long): DataFrame = {
    val doms = groups.toSeq.sorted
    val scoped = df.filter(col(groupCol).isin(doms: _*))
    val nat = scoped
      .select(col(groupCol),
        coalesce(TextFunctions.tokenCount(col(textCol)).cast("long"), lit(0L))
          .as("n_tokens"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("nat_tokens"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // (domain, natural docs, natural tokens, full epochs, remainder tokens)
    val recipe = doms.flatMap { d =>
      nat.get(d).filter(_._2 > 0L).map { case (nd, td) =>
        val desired = budgetOf(d)
        (d, nd, td, desired / td, desired % td)
      }
    }
    val spark = df.sparkSession
    import spark.implicits._
    val fullDf = recipe
      .flatMap { case (d, nd, td, full, _) => (0L until full).map(e => (d, e, nd, td)) }
      .toDF(groupCol, "epoch", "n_docs", "epoch_tokens")
    val remBudgets = recipe.collect { case (d, _, _, _, rem) if rem > 0 => d -> rem }.toMap
    if (remBudgets.isEmpty) fullDf
    else {
      val epochOf = recipe.foldLeft(lit(-1L)) { case (acc, (d, _, _, full, _)) =>
        when(col(groupCol) === d, lit(full)).otherwise(acc) }
      val partial = Sampling.tokenBudgetSample(
          df.filter(col(groupCol).isin(remBudgets.keys.toSeq: _*)),
          idCol, textCol, groupCol, remBudgets)
        .groupBy(col(groupCol))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("epoch_tokens"))
        .withColumn("epoch", epochOf)
        .select(col(groupCol), col("epoch"), col("n_docs"), col("epoch_tokens"))
      fullDf.unionByName(partial)
    }
  }

  /** A shard file failed its manifest verification on read: the message
    * names each damaged (wave, bucket, shard_seq) and which of the four
    * checks diverged — the checksum localizes corruption to the shard.
    */
  final class ShardIntegrityException(msg: String) extends RuntimeException(msg)

  private def dataPath(exportRoot: String): String =
    java.nio.file.Paths.get(exportRoot, "data").toString
  private def manifestTablePath(exportRoot: String): String =
    java.nio.file.Paths.get(exportRoot, "manifest").toString

  /** Per-shard verification aggregate RECOMPUTED from document rows —
    * nothing is trusted from write time: `n_tokens` is re-derived from the
    * stored text, the packing checksum re-hashed from (id, re-derived
    * tokens), and `content_checksum` (bit_xor over xxhash64(id:text))
    * covers byte-level text damage the token-count signature cannot see
    * (a same-token-count in-place edit).
    */
  private def recomputedManifest(data: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val ntok = coalesce(TextFunctions.tokenCount(col(textCol)).cast("long"), lit(0L))
    data
      .withColumn("__nt", ntok)
      .groupBy(col("wave"), col("bucket"), col("shard_seq"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("shard_tokens"),
        expr(s"bit_xor(xxhash64(concat(cast($idCol as string), ':', " +
          "cast(__nt as string))))").as("checksum"),
        expr(s"bit_xor(xxhash64(concat(cast($idCol as string), ':', " +
          s"coalesce($textCol, ''))))").as("content_checksum"),
        min(col(idCol)).as("first_doc"))
  }

  /** Materialize the export: land ONE immutable parquet file per
    * (bucket, shard_seq), rows in `(md5(id), id)` packing order, under a
    * [[graft.storage.VersionedTable]] CAS commit at `exportRoot/data`, then
    * recompute the manifest FROM THE COMMITTED FILES (not from the input
    * frame — the manifest certifies what readers will actually scan) and
    * commit it to `exportRoot/manifest`. Returns this wave's committed
    * manifest rows.
    *
    * One-file-per-shard is by construction, not configuration: a hash
    * `repartition` on (bucket, shard_seq) places each shard wholly in one
    * task, and the `partitionBy` write then emits exactly one part file
    * per shard directory from that task; `sortWithinPartitions` on
    * (bucket, shard_seq, md5(id), id) makes the file's row order the
    * packing order, so a sequential reader streams documents exactly as
    * the epoch/packing contract defines. Write parallelism is
    * min(`spark.sql.shuffle.partitions`, shard count): each task holds
    * whole shards and writes them sequentially — at 100 TB with ~100k
    * 1 GB shards, size shuffle.partitions toward the cluster's executor
    * slots so every slot streams its own run of shards; no task ever
    * holds more than its shards' rows.
    *
    * Crash/replay safety (the streaming contract): both commits carry the
    * wave as their idempotence key when `guarded` — a replayed wave skips
    * the data append (already committed) and the manifest recompute then
    * reads the wave's rows back from the committed table, so the pair
    * converges without double-packing. Shards are immutable once written
    * (waves only APPEND segments); a re-export is a new wave, never a
    * rewrite — the [[graft.streaming.ShardStream]] invariant.
    */
  def writeShards(df: DataFrame, idCol: String, textCol: String,
      buckets: Int, budgetTokens: Long, exportRoot: String,
      wave: Long = 0L, guarded: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val batchId = if (guarded) Some(wave) else None
    val assigned = assignCore(df, idCol,
        coalesce(TextFunctions.tokenCount(col(textCol)).cast("long"), lit(0L)),
        buckets, budgetTokens, carry = Seq(textCol))
      .withColumn("wave", lit(wave))
    var writtenDir: Option[String] = None
    VersionedTable.append(dataPath(exportRoot), batchId) { dir =>
      writtenDir = Some(dir)
      assigned
        // partitionBy consumes its columns into directory names; duplicate
        // them so the data file keeps typed wave/bucket/shard_seq rows
        // (read back without partition-type inference fragility). The
        // pw/pb/ps directory triple makes every shard's single file
        // ADDRESSABLE BY PATH — the device publishIncremental's byte-copy
        // publish stands on
        .withColumn("pw", col("wave"))
        .withColumn("pb", col("bucket")).withColumn("ps", col("shard_seq"))
        .repartition(col("pb"), col("ps"))
        .sortWithinPartitions(col("pb"), col("ps"),
          md5(col(idCol).cast("string")), col(idCol))
        .write
        // v2 committer: task commit moves files in parallel as tasks
        // finish; v1's job commit renames every shard directory
        // SERIALLY on the driver — measured dominant at high shard
        // counts (the segment dir is private until the manifest CAS
        // flips, so v2's weaker job-abort atomicity is irrelevant here)
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .partitionBy("pw", "pb", "ps").parquet(dir)
    }
    // manifest from the WRITTEN files: the freshly committed segment when
    // this call did the write, the committed table's wave slice when a
    // replayed wave skipped it
    val landed = writtenDir match {
      case Some(dir) => spark.read.parquet(dir).drop("pw", "pb", "ps")
      case None => VersionedTable.read(spark, dataPath(exportRoot))
        .filter(col("wave") === wave)
    }
    val manifest = recomputedManifest(landed, idCol, textCol)
    VersionedTable.append(manifestTablePath(exportRoot), batchId)(
      dir => manifest.write.parquet(dir))
    VersionedTable.read(spark, manifestTablePath(exportRoot))
      .filter(col("wave") === wave)
  }

  /** The committed manifest table: one row per immutable shard, all waves. */
  def shardManifests(spark: SparkSession, exportRoot: String): DataFrame =
    VersionedTable.read(spark, manifestTablePath(exportRoot))

  /** Merkle attestation tree over a shard manifest — the reproducibility
    * receipt for a published corpus: leaf = xxhash64 over the shard's
    * manifest row (bucket, seq, doc count, token sum, packing checksum),
    * bucket node = xxhash64 over its leaves in shard_seq order, root =
    * xxhash64 over bucket nodes in bucket order. Two exports agree iff
    * their roots agree (one BIGINT to pin in a paper or a model card),
    * and a divergence localizes top-down in O(log): root → the bucket
    * whose node moved → the shard whose leaf moved — without reading a
    * byte of data. Deterministic under any partitioning (children are
    * sorted before hashing).
    *
    * Scale shape: leaves are the manifest (already model-scale); the
    * bucket fold gathers ≤ shards-per-bucket rows per group and the root
    * gathers ≤ |buckets| — never data.
    */
  def manifestMerkle(manifests: DataFrame): DataFrame = {
    val leafKey = concat_ws(":",
      col("bucket").cast("string"), col("shard_seq").cast("string"),
      col("n_docs").cast("string"), col("shard_tokens").cast("string"),
      col("checksum").cast("string"))
    val leaves = manifests.select(col("bucket"), col("shard_seq"),
      xxhash64(leafKey).as("node_hash"))
    def foldChildren(keyF: Column => Column) = (xs: Column) =>
      xxhash64(array_join(transform(array_sort(xs), keyF), "|"))
    val buckets = leaves.groupBy(col("bucket"))
      .agg(foldChildren(x => concat_ws(":",
          x.getField("shard_seq").cast("string"),
          x.getField("node_hash").cast("string")))(
        collect_list(struct(col("shard_seq"), col("node_hash")))).as("node_hash"))
    val root = buckets
      .agg(foldChildren(x => concat_ws(":",
          x.getField("bucket").cast("string"),
          x.getField("node_hash").cast("string")))(
        collect_list(struct(col("bucket"), col("node_hash")))).as("node_hash"))
    leaves.select(lit(0L).as("level"),
        concat_ws("/", col("bucket").cast("string"),
          col("shard_seq").cast("string")).as("node_key"),
        col("node_hash"))
      .unionByName(buckets.select(lit(1L).as("level"),
        col("bucket").cast("string").as("node_key"), col("node_hash")))
      .unionByName(root.select(lit(2L).as("level"),
        lit("root").as("node_key"), col("node_hash")))
  }

  /** Incremental PHYSICAL publish — q121's manifest diff made real: bring
    * a flat publish directory (`destRoot/shards/w{wave}-b{bucket}-s{seq}
    * .parquet` + `_manifest.parquet`, the object-store layout a training
    * job consumes) up to date with the export at `exportRoot` by
    * landing ONLY the shards the diff names — `added`/`changed` files
    * are BYTE-COPIED from their immutable export file (every shard is
    * one file addressable by its `pw=/pb=/ps=` directory path, the
    * [[writeShards]] layout contract), `removed` files are deleted,
    * untouched shards are never read or written. No Spark restaging:
    * at object-store scale the copy is a server-side request per
    * changed shard.
    *
    * Every named source file is VERIFIED before any destination file is
    * replaced: its (n_docs, shard_tokens, packing checksum, content
    * checksum) are recomputed from the bytes and compared to the export
    * manifest — a divergence throws [[ShardIntegrityException]] and
    * leaves the destination untouched. Each landed file is copied to a
    * temp name and atomically renamed (a concurrent reader sees either
    * the old or the new whole file).
    *
    * Manifest swap and crash safety: each publish writes an IMMUTABLE
    * versioned manifest (`_manifest.v<N>.parquet`) and then flips the
    * tiny `_manifest.current` pointer file via a single atomic rename —
    * a crash anywhere leaves the pointer naming a complete manifest, and
    * a reader that resolved the pointer always opens a whole manifest.
    * `removed` files are deleted AFTER the flip, and the previous
    * manifest generation is retained one cycle, so a reader holding the
    * OLD manifest still finds every file it names. The one remaining
    * read-skew window is inherent to fixed shard names: a `changed`
    * shard's file is replaced in place before the flip, so an
    * old-manifest reader of exactly that shard can see new bytes — the
    * divergence is DETECTED, not silent, because every shard read
    * verifies the manifest checksums ([[readShards]]). Legacy
    * destinations with a directory `_manifest.parquet` are resolved and
    * migrated on the next publish.
    *
    * Scale shape: the diff is manifest-scale; the verification read
    * scans exactly the changed shards' files (an explicit file list —
    * untouched directories never enter the plan), so work is O(changed
    * shards), never O(corpus). The per-file copies are a driver loop
    * over the changed-shard count (the same order as the upload
    * requests an object-store publisher would issue).
    *
    * Returns one row per diff entry: (wave, bucket, shard_seq, status,
    * n_docs, shard_tokens, checksum) — values from the CURRENT manifest
    * for added/changed (certified against the published bytes), from the
    * PREVIOUS manifest for removed.
    */
  def publishIncremental(spark: SparkSession, exportRoot: String,
      destRoot: String, idCol: String, textCol: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import spark.implicits._
    val shardsDir = Paths.get(destRoot, "shards")
    Files.createDirectories(shardsDir)
    val legacyManifestDir = Paths.get(destRoot, "_manifest.parquet")
    val pointer = Paths.get(destRoot, "_manifest.current")
    def versionedManifest(v: Long) = Paths.get(destRoot, s"_manifest.v$v.parquet")
    // resolve the committed manifest: pointer-named version, or the
    // legacy directory layout (pre-versioning destinations)
    val prevVersion: Long =
      if (Files.exists(pointer))
        new String(Files.readAllBytes(pointer), "UTF-8").trim.toLong
      else 0L
    val prevManifestPath: Option[java.nio.file.Path] =
      if (prevVersion > 0) Some(versionedManifest(prevVersion))
      else if (Files.exists(legacyManifestDir)) Some(legacyManifestDir)
      else None

    val cur = shardManifests(spark, exportRoot)
    // materialized EAGERLY (localCheckpoint): the previous manifest's
    // rows are still needed for the removed-shard report after the flip
    val prev = prevManifestPath
      .map(p => spark.read.parquet(p.toString).localCheckpoint(true))
      .getOrElse(cur.filter(lit(false)))
    val keys = Seq("wave", "bucket", "shard_seq")
    val p = prev.select(col("wave"), col("bucket"), col("shard_seq"),
      struct(col("checksum"), col("n_docs"), col("shard_tokens")).as("__p"))
    val n = cur.select(col("wave"), col("bucket"), col("shard_seq"),
      struct(col("checksum"), col("n_docs"), col("shard_tokens")).as("__n"))
    val diff = p.join(n, keys, "full_outer")
      .withColumn("status",
        when(col("__p").isNull, lit("added"))
          .when(col("__n").isNull, lit("removed"))
          .when(col("__p") =!= col("__n"), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .select(col("wave"), col("bucket"), col("shard_seq"), col("status"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

    def fileName(w: Long, b: Long, s: Long) = s"w$w-b$b-s$s.parquet"

    val toLand = diff.filter(_._4 != "removed").map(t => (t._1, t._2, t._3))
    if (toLand.nonEmpty) {
      // every named shard is ONE immutable file addressable by its
      // pw=/pb=/ps= directory path inside a committed data segment — no
      // Spark restaging, the publish is a byte copy (at object-store
      // scale: a server-side copy request per changed shard)
      val segs = VersionedTable.readManifest(dataPath(exportRoot))
        .map(_.segments).getOrElse(Seq.empty)
      def locate(w: Long, b: Long, sq: Long): java.nio.file.Path = {
        val hits = segs.flatMap { seg =>
          val d = Paths.get(dataPath(exportRoot), seg,
            s"pw=$w", s"pb=$b", s"ps=$sq")
          if (!Files.isDirectory(d)) Seq.empty
          else {
            val st = Files.list(d)
            try {
              import scala.jdk.CollectionConverters._
              st.iterator().asScala
                .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
            } finally st.close()
          }
        }
        require(hits.size == 1,
          s"shard ($w, $b, $sq) resolves to ${hits.size} files under " +
            s"$exportRoot — an unguarded re-export of the same wave?")
        hits.head
      }
      val located = toLand.map(t => t -> locate(t._1, t._2, t._3))
      // verify the SOURCE bytes (immutable once committed) against the
      // export manifest BEFORE any destination file is replaced — one
      // read over exactly the changed shards' files
      val rec = recomputedManifest(
          spark.read.parquet(located.map(_._2.toString).toSeq: _*),
          idCol, textCol)
        .select(col("wave"), col("bucket"), col("shard_seq"),
          col("n_docs").as("r_docs"), col("shard_tokens").as("r_tokens"),
          col("checksum").as("r_checksum"), col("content_checksum").as("r_content"))
      val landKeys = broadcast(toLand.toSeq.toDF("wave", "bucket", "shard_seq"))
      val bad = cur.join(landKeys, keys)
        .join(rec, keys, "full_outer")
        .filter(col("n_docs").isNull || col("r_docs").isNull ||
          col("n_docs") =!= col("r_docs") ||
          col("shard_tokens") =!= col("r_tokens") ||
          col("checksum") =!= col("r_checksum") ||
          col("content_checksum") =!= col("r_content"))
        .limit(20).collect()
      if (bad.nonEmpty)
        throw new ShardIntegrityException(
          s"incremental publish found ${bad.length}+ divergent shards; " +
            "destination left untouched")
      // land: copy to a temp name, then an atomic per-file rename — a
      // concurrent reader sees either the old or the new whole file
      located.foreach { case ((w, b, sq), src) =>
        val tmp = shardsDir.resolve(fileName(w, b, sq) + ".tmp")
        Files.copy(src, tmp, StandardCopyOption.REPLACE_EXISTING)
        Files.move(tmp, shardsDir.resolve(fileName(w, b, sq)),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    }
    // flip: write the new IMMUTABLE manifest generation, then swap the
    // pointer with one atomic file rename — never a delete-then-move
    // window with no manifest on disk
    val newVersion = prevVersion + 1
    cur.coalesce(1).write.mode("overwrite")
      .parquet(versionedManifest(newVersion).toString)
    val tmpPtr = Paths.get(destRoot, "_manifest.current.tmp")
    Files.write(tmpPtr, s"$newVersion\n".getBytes("UTF-8"))
    Files.move(tmpPtr, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // post-flip cleanup: removed data files go AFTER the swap (an
    // old-manifest reader still finds every file it names until here);
    // the previous manifest generation is retained one cycle, older ones
    // and the legacy directory layout are garbage
    diff.filter(_._4 == "removed").foreach { t =>
      Files.deleteIfExists(shardsDir.resolve(fileName(t._1, t._2, t._3)))
    }
    def deleteTree(p: java.nio.file.Path): Unit = if (Files.exists(p)) {
      val st = Files.walk(p)
      try st.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { Files.deleteIfExists(f); () })
      finally st.close()
    }
    deleteTree(legacyManifestDir)
    (1L until prevVersion).foreach(v => deleteTree(versionedManifest(v)))

    // report: diff statuses + manifest values (current manifest for
    // added/changed — just certified against the published bytes — and
    // the previous manifest for removed)
    val diffDf = diff.toSeq.toDF("wave", "bucket", "shard_seq", "status")
    val curV = cur.select(col("wave"), col("bucket"), col("shard_seq"),
      col("n_docs").as("__cd"), col("shard_tokens").as("__ct"),
      col("checksum").as("__cc"))
    val prevV = prev.select(col("wave"), col("bucket"), col("shard_seq"),
      col("n_docs").as("__pd"), col("shard_tokens").as("__pt"),
      col("checksum").as("__pc"))
    diffDf.join(curV, keys, "left").join(prevV, keys, "left")
      .select(col("wave"), col("bucket"), col("shard_seq"), col("status"),
        coalesce(col("__cd"), col("__pd")).as("n_docs"),
        coalesce(col("__ct"), col("__pt")).as("shard_tokens"),
        coalesce(col("__cc"), col("__pc")).as("checksum"))
  }

  /** Per-epoch SHARD order — the WebDataset/TFRecord consumption pattern:
    * shuffle the shard LIST each epoch (cheap, model-scale) and stream
    * every shard sequentially in its packing order (the read pattern the
    * one-file-per-shard layout exists for). Rank = `md5(seed:bucket:seq)`
    * — a fresh deterministic permutation per seed, reproducible on any
    * engine. Adds `shard_rank` (1-based) and `pos_base` (docs in all
    * earlier-ranked shards), so `pos_base + within-shard rank` is the
    * doc's global position in the epoch stream.
    *
    * The windows here are UNPARTITIONED by design: they run on the
    * MANIFEST relation (corpus/budget rows — ~100k rows for 1 GB shards
    * at 100 TB), never on documents.
    */
  def epochShardOrder(manifests: DataFrame, epochSeed: String): DataFrame = {
    val keyCols = (if (manifests.columns.contains("wave"))
      Seq(col("wave")) else Seq.empty) ++ Seq(col("bucket"), col("shard_seq"))
    val key = md5(concat_ws(":", lit(epochSeed) +: keyCols: _*))
    val ord = Window.orderBy(key +: keyCols: _*)
    manifests
      .withColumn("shard_rank", row_number().over(ord).cast("long"))
      .withColumn("pos_base", coalesce(
        sum(col("n_docs")).over(
          Window.orderBy(col("shard_rank"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
  }

  /** Read a written export in epoch-`epochSeed` order: every doc row
    * carries `shard_rank`, its 1-based `within_shard` packing rank, and
    * its global `epoch_pos` — a training job sorts/iterates by
    * (shard_rank, within_shard), which on this layout means streaming
    * whole files sequentially. The shard-order relation broadcasts
    * (model-scale); the within-shard rank window is bounded by the shard
    * budget, so no task ever sorts more than one shard's docs.
    */
  def readEpoch(spark: SparkSession, exportRoot: String, idCol: String,
      textCol: String, epochSeed: String, verify: Boolean = false): DataFrame = {
    val data = readShards(spark, exportRoot, idCol, textCol, verify)
    val order = epochShardOrder(shardManifests(spark, exportRoot), epochSeed)
      .select(col("wave"), col("bucket"), col("shard_seq"),
        col("shard_rank"), col("pos_base"))
    val w = Window.partitionBy(col("wave"), col("bucket"), col("shard_seq"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    data.join(broadcast(order), Seq("wave", "bucket", "shard_seq"))
      .withColumn("within_shard", row_number().over(w).cast("long"))
      .withColumn("epoch_pos", col("pos_base") + col("within_shard"))
  }

  /** The first `nShards` shards of the epoch-`epochSeed` order, read with
    * STATIC partition pruning: the shard keys come from the manifest-scale
    * order relation (collected — at most `nShards` rows), and the data
    * scan filters on the LITERAL (wave, bucket, shard_seq) partition
    * values, so only those shards' files are ever listed or read — a
    * training job's resume/preview head costs O(nShards), not O(corpus),
    * no matter how large the export is. Same row shape as [[readEpoch]].
    */
  def readEpochHead(spark: SparkSession, exportRoot: String, idCol: String,
      textCol: String, epochSeed: String, nShards: Int = 1): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val order = epochShardOrder(shardManifests(spark, exportRoot), epochSeed)
      .filter(col("shard_rank") <= nShards.toLong)
      .select(col("wave"), col("bucket"), col("shard_seq"),
        col("shard_rank"), col("pos_base"))
    val keys = order.collect() // ≤ nShards rows by construction
    require(keys.nonEmpty, s"empty export at $exportRoot")
    // filter on the pw/pb/ps PARTITION columns (the directory triple), not
    // the duplicated data columns: directory pruning skips non-matching
    // shards before any file is listed or its footer read — a wave/bucket/
    // shard_seq predicate would only prune at footer level, which still
    // reads every shard's footer (measured: ~10x input at 10x corpus)
    val raw = VersionedTable.read(spark, dataPath(exportRoot))
    val partitioned = raw.columns.contains("pw")
    val pred = keys.map { r =>
      val (cw, cb, cs) =
        if (partitioned) (col("pw"), col("pb"), col("ps"))
        else (col("wave"), col("bucket"), col("shard_seq"))
      cw === r.getAs[Number]("wave").longValue() &&
        cb === r.getAs[Number]("bucket").longValue() &&
        cs === r.getAs[Number]("shard_seq").longValue()
    }.reduce(_ || _)
    val data = raw.filter(pred).drop("pw", "pb", "ps")
    val w = Window.partitionBy(col("wave"), col("bucket"), col("shard_seq"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    data.join(broadcast(order), Seq("wave", "bucket", "shard_seq"))
      .withColumn("within_shard", row_number().over(w).cast("long"))
      .withColumn("epoch_pos", col("pos_base") + col("within_shard"))
  }

  /** Read the exported documents back, VERIFYING every shard against its
    * manifest first (default on): n_docs, shard_tokens and the packing
    * checksum are recomputed from the stored text, plus the byte-level
    * `content_checksum` — any divergence (or a shard missing from either
    * side) throws [[ShardIntegrityException]] naming the damaged shards.
    * The verification aggregate shuffles only (wave, bucket, shard_seq,
    * four longs) — manifest-scale, corpus/budget rows — and the mismatch
    * set collected to the driver is at most that.
    */
  def readShards(spark: SparkSession, exportRoot: String, idCol: String,
      textCol: String, verify: Boolean = true): DataFrame = {
    val data = VersionedTable.read(spark, dataPath(exportRoot))
    if (verify) {
      val rec = recomputedManifest(data, idCol, textCol)
        .withColumnRenamed("n_docs", "r_docs")
        .withColumnRenamed("shard_tokens", "r_tokens")
        .withColumnRenamed("checksum", "r_checksum")
        .withColumnRenamed("content_checksum", "r_content")
        .drop("first_doc")
      val stored = shardManifests(spark, exportRoot)
      val bad = stored.join(rec, Seq("wave", "bucket", "shard_seq"), "full_outer")
        .filter(col("n_docs").isNull || col("r_docs").isNull ||
          col("n_docs") =!= col("r_docs") ||
          col("shard_tokens") =!= col("r_tokens") ||
          col("checksum") =!= col("r_checksum") ||
          col("content_checksum") =!= col("r_content"))
        .select(col("wave"), col("bucket"), col("shard_seq"),
          col("n_docs"), col("r_docs"), col("checksum"), col("r_checksum"),
          col("content_checksum"), col("r_content"))
        .limit(20).collect()
      if (bad.nonEmpty)
        throw new ShardIntegrityException(
          "shard verification failed for (wave, bucket, shard_seq): " +
            bad.map(r => s"(${r.get(0)}, ${r.get(1)}, ${r.get(2)})").mkString(", ") +
            s" — first divergence: ${bad.head}")
    }
    data
  }
}
