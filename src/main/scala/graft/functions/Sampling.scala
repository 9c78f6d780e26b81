package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus-sampling operators for training-data mixing.
  *
  * Training recipes are specified as per-domain TOKEN budgets ("this many
  * tokens of web, this many of code"), not document counts — documents vary
  * by 100× in length, so a doc-count quota (see q68's fixed-mixture draw)
  * hits its token target only in expectation. [[tokenBudgetSample]] is the
  * budget-exact greedy variant the epoch-mixing recipes actually use.
  *
  * Determinism: candidates are ordered by `(md5(id), id)` inside each
  * group — a reproducible pseudo-random permutation whose ordering any SQL
  * engine can replay (the q68 pattern), so draws are stable across runs,
  * partitionings, and engines.
  *
  * Scale shape: every per-group window here is pre-trimmed with a LITERAL
  * rank bound so it plans as a WindowGroupLimit with a PARTIAL pre-trim —
  * each map partition forwards at most `bound` rows per group to the
  * group-key exchange, so the dominant group never sorts its full doc set
  * in a single task (`PlanAuditSpec` pins the plan shape for q92, q103,
  * q107).
  *
  * SESSION-CONFIG NOTE: the budgeted operators here (and
  * [[ShardExport.epochOrder]]) RAISE
  * `spark.sql.optimizer.windowGroupLimitThreshold` for the whole session
  * when their literal rank bound exceeds it — see
  * [[ensureGroupLimitThreshold]] for why the raise cannot be scoped and why
  * raise-only keeps it monotone (plans can only GAIN pre-trims, never lose
  * one).
  */
object Sampling {

  /** Spark only rewrites `row_number() <= k` into a WindowGroupLimit when
    * k is at or below `spark.sql.optimizer.windowGroupLimitThreshold`
    * (default 1000) — a mixing budget routinely exceeds that, silently
    * dropping the PARTIAL pre-trim and re-growing the single-task
    * full-domain sort. The pre-trim is the whole point of these
    * operators, so they raise the threshold to cover their own bound
    * (raise-only: a session that already set it higher is untouched; for
    * row_number the partial trim buffers nothing beyond the local sort
    * the final window needs anyway).
    *
    * This is a deliberate SESSION-WIDE, PERSISTENT raise, not a scoped
    * override. It cannot be save/restored around DataFrame construction:
    * the optimizer reads the conf lazily at ACTION time (and again on
    * every downstream composition over the returned frame), so a restore
    * would silently drop the pre-trim from exactly the plans this guard
    * exists to protect. Raise-only makes the mutation monotone — a query
    * planned after a large-budget draw can only GAIN WindowGroupLimit
    * rewrites it was previously denied, never lose one — so plan shapes
    * are order-dependent only in the safe direction. Callers that need a
    * pristine threshold should run sampling in its own session.
    */
  private[functions] def ensureGroupLimitThreshold(df: DataFrame, bound: Long): Unit = {
    val key = "spark.sql.optimizer.windowGroupLimitThreshold"
    val cur = df.sparkSession.conf.get(key, "1000").toLong
    if (cur >= 0 && cur < bound) df.sparkSession.conf.set(key, bound)
  }

  /** Greedy per-group token-budget sample: within each value of
    * `groupCol`, walk docs in `(md5(id), id)` order and keep a doc while
    * the running token total BEFORE it is still under the group's budget
    * (so the budget is overshot by at most one document, never
    * undershot while docs remain — the standard greedy-prefix contract).
    * Groups absent from `budgets` get budget 0 (drop everything).
    * NULL/all-whitespace text counts 0 tokens and rides along while its
    * group's budget is unexhausted (the [[ShardExport.shardAssign]] / q120
    * oracle contract: zero-token docs never consume budget).
    *
    * Returns one row per KEPT doc: (idCol, groupCol, n_tokens,
    * cum_before) — `cum_before` is the running total ahead of the doc,
    * handy for audit and for resuming a draw.
    *
    * Scale shape: a doc with >=1 token can only be kept while fewer than
    * `budget` positive-token docs precede it (each adds >=1 to the running
    * total), so positive-token docs are pre-trimmed with a LITERAL
    * `row_number() <= maxBudget` rank filter — planning as a
    * WindowGroupLimit with a PARTIAL pre-trim, the q103/ANN shape: each
    * map partition forwards at most maxBudget rows per group, and the
    * dominant group never sorts its full doc set in one task. The exact
    * running-total window then runs over survivors only (<= maxBudget
    * docs per group, plus zero-token docs, which pass the pre-trim
    * unconditionally since they never advance the total — empty docs are
    * assumed rare; an all-empty corpus degrades to the unprefixed sort).
    */
  def tokenBudgetSample(
      df: DataFrame, idCol: String, textCol: String, groupCol: String,
      budgets: Map[String, Long]): DataFrame = {
    val budget = budgets.foldLeft(lit(0L)) { case (acc, (g, b)) =>
      when(col(groupCol) === g, lit(b)).otherwise(acc) }
    val maxBudget = budgets.values.foldLeft(0L)(math.max)
    ensureGroupLimitThreshold(df, maxBudget)
    val ord = Seq(md5(col(idCol).cast("string")), col(idCol))
    // tokenCount(text) == 0 iff text is NULL or all-whitespace (anchored-
    // regex test, early-exit at the first non-ws char) — so only the
    // positive branch pays the full regex tokenization; the zero branch's
    // second corpus scan is a scan+rlike, never a second split. NULL text
    // must be routed EXPLICITLY into the zero branch (rlike is NULL on
    // NULL input, which a bare filter drops from BOTH branches): it rides
    // along as an n_tokens=0 doc, the same contract as shardAssign and the
    // manifest oracles.
    val isZero = col(textCol).isNull || col(textCol).rlike("^\\s*$")
    // literal rank pre-trim on the positive-token docs (WindowGroupLimit);
    // zero-token docs can sit arbitrarily deep in the prefix (they never
    // consume budget) so they bypass the trim and rejoin before the exact
    // running-total pass
    val posTrimmed = df.filter(!isZero)
      .select(col(idCol), col(groupCol),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(ord: _*)))
      .filter(col("__rk") <= lit(maxBudget))
      .drop("__rk")
    val zeros = df.filter(isZero)
      .select(col(idCol), col(groupCol), lit(0L).as("n_tokens"))
    val w = Window.partitionBy(col(groupCol)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    posTrimmed.unionByName(zeros)
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("cum_before") < budget)
  }

  /** Temperature-scaled domain quotas — the α-sampling recipe of
    * multilingual/multi-domain pre-training (T5/mT5, XLM-R): a domain with
    * corpus share s gets budget share ∝ s^α, α<1 flattening the mixture so
    * big domains can't drown small ones. Quotas are apportioned by the
    * LARGEST-REMAINDER method so they sum to exactly `budget`.
    *
    * Determinism (the oracle story): the ONLY floating-point step is
    * pow(share, α), immediately quantized to integer billionths
    * (`round(·×1e9)` — share itself is an exact IEEE division of two
    * counts, identical in every engine). Everything after is integer
    * arithmetic: base = budget·p9 div Σp9, remainders ranked
    * (rem DESC, domain ASC) hand out the leftover seats. All window/agg
    * work happens on the DOMAIN table (model-scale rows), not the corpus.
    */
  def temperatureQuotas(
      docs: DataFrame, domainCol: String, alpha: Double, budget: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(budget >= 0, s"budget must be >= 0, got $budget")
    // all whole-table scalars (total, Σp9, Σbase) ride as window aggregates
    // over the single-partition domain table — no scalar cross joins, so
    // the plan stays free of nested-loop joins (PlanAuditSpec's inventory
    // invariant) and the whole computation is one tiny window stage
    val whole = Window.partitionBy(lit(0))
    docs.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("__nt", sum(col("n_docs")).over(whole))
      .withColumn("__p9",
        round(pow(col("n_docs").cast("double") / col("__nt").cast("double"), alpha)
          * lit(1e9)).cast("long"))
      .withColumn("__sp", sum(col("__p9")).over(whole))
      .withColumn("__base", expr(s"($budget * __p9) div __sp"))
      .withColumn("__rem", expr(s"($budget * __p9) % __sp"))
      .withColumn("__k", lit(budget) - sum(col("__base")).over(whole))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(lit(0)).orderBy(col("__rem").desc, col("domain"))))
      .select(col("domain"), col("n_docs"),
        (col("__base") + when(col("__rk") <= col("__k"), 1L).otherwise(0L))
          .as("quota"))
  }

  /** UniMax budget waterfilling (Chung et al. 2023, "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): distribute `totalBudget` tokens across languages as
    * EVENLY as possible, capping every language at `maxEpochs` passes over
    * its natural token count — the allocation that replaces temperature
    * sampling's power law (see [[temperatureQuotas]]) with a uniform share
    * plus a repeat cap, so small languages get maximal budget without
    * over-epoching.
    *
    * Contract (integer-exact, engine-restatable): languages sort by
    * cap = maxEpochs·nat_tokens ascending (ties by name); a language is
    * capped iff every smaller language is capped AND
    * cap·(languages from here on) <= totalBudget − Σ(smaller caps) —
    * i.e. the uniform share of what remains still covers its cap. Capped
    * languages take exactly their cap; the leftover splits evenly (floor
    * division) among the uncapped; the < U-token division remainder stays
    * unallocated. Every step is BIGINT arithmetic — the capped test
    * multiplies instead of dividing, so there is no rounding to agree on.
    *
    * Scale shape: ONE corpus aggregation (group-by language); the
    * waterfilling itself is window algebra over the LANGUAGE table
    * (model-scale single-partition windows, the [[temperatureQuotas]]
    * shape — no scalar cross joins, no driver loop).
    */
  def unimaxAllocation(docs: DataFrame, groupCol: String, textCol: String,
      totalBudget: Long, maxEpochs: Long): DataFrame = {
    require(totalBudget >= 0, s"totalBudget must be >= 0, got $totalBudget")
    unimaxCore(docs, groupCol, textCol, lit(totalBudget), maxEpochs)
  }

  /** [[unimaxAllocation]] with the budget expressed as a FRACTION of the
    * corpus's own token count (budget = num·T div den) — the budget rides
    * the same language-table window stage as the waterfilling, so the
    * corpus is scanned once, with no separate total aggregation and no
    * driver-side scalar.
    */
  def unimaxAllocationFrac(docs: DataFrame, groupCol: String, textCol: String,
      budgetNum: Long, budgetDen: Long, maxEpochs: Long): DataFrame = {
    require(budgetNum >= 0 && budgetDen > 0,
      s"need budgetNum >= 0 and budgetDen > 0, got $budgetNum/$budgetDen")
    // T = Σ nat_tokens over the language table (langs with zero tokens
    // are filtered but contribute nothing to T, so this equals the
    // whole-corpus token count)
    val whole = Window.partitionBy(lit(0))
    unimaxCore(docs, groupCol, textCol,
      expr(s"(${budgetNum}L * __T) div ${budgetDen}L"), maxEpochs,
      withTotal = Some(sum(col("nat_tokens")).over(whole)))
  }

  private def unimaxCore(docs: DataFrame, groupCol: String, textCol: String,
      budget: org.apache.spark.sql.Column, maxEpochs: Long,
      withTotal: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(maxEpochs > 0, s"maxEpochs must be positive, got $maxEpochs")
    val whole = Window.partitionBy(lit(0))
    val ordW = Window.partitionBy(lit(0))
      .orderBy(col("cap_tokens"), col("__g"))
    val cumW = ordW.rowsBetween(Window.unboundedPreceding, -1)
    val runW = ordW.rowsBetween(Window.unboundedPreceding, 0)
    docs
      .select(col(groupCol).as("__g"),
        coalesce(TextFunctions.tokenCount(col(textCol)).cast("long"), lit(0L))
          .as("__nt"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("nat_tokens"))
      .filter(col("nat_tokens") > 0L)
      .withColumn("cap_tokens", col("nat_tokens") * lit(maxEpochs))
      .withColumn("__T", withTotal.getOrElse(lit(0L)))
      .withColumn("__B", budget)
      .withColumn("__L", count(lit(1)).over(whole))
      .withColumn("__i", row_number().over(ordW).cast("long"))
      .withColumn("__cumprev", coalesce(sum(col("cap_tokens")).over(cumW), lit(0L)))
      .withColumn("__notok",
        when(col("cap_tokens") * (col("__L") - col("__i") + 1L) <=
          col("__B") - col("__cumprev"), 0L).otherwise(1L))
      .withColumn("capped", sum(col("__notok")).over(runW) === 0L)
      .withColumn("__cappedSum",
        sum(when(col("capped"), col("cap_tokens")).otherwise(0L)).over(whole))
      .withColumn("__u",
        sum(when(col("capped"), 0L).otherwise(1L)).over(whole))
      .withColumn("alloc_tokens",
        when(col("capped"), col("cap_tokens"))
          .otherwise(expr("(__B - __cappedSum) div __u")))
      .select(col("__g").as(groupCol), col("n_docs"), col("nat_tokens"),
        col("cap_tokens"), col("capped"), col("alloc_tokens"))
  }

  /** Draw each domain's temperature quota in the reproducible `(md5(id),
    * id)` order (the q68 pattern): returns the KEPT docs (idCol, domain).
    * A domain smaller than its quota contributes everything it has.
    *
    * Scale shape: the per-domain rank window is pre-trimmed with a
    * LITERAL `row_number() <= maxQuota` bound so it plans as a
    * WindowGroupLimit with a PARTIAL pre-trim (the q103/ANN shape,
    * `PlanAuditSpec`-guarded) — without it the dominant domain (40–50% of
    * a web corpus, exactly what α-sampling exists to tame) sorts its full
    * doc set in ONE task. maxQuota comes from collecting the quota table,
    * which is model-scale by construction (one row per domain, the IVF
    * trainCentroids precedent); the exact per-domain `quota` filter then
    * applies after the broadcast join, over pre-trimmed rows only.
    */
  def temperatureMix(
      docs: DataFrame, idCol: String, domainCol: String,
      alpha: Double, budget: Long): DataFrame = {
    // internal aliases so a caller whose domain column is literally named
    // "domain" doesn't collide with the quota table's output column
    val quotasDf = temperatureQuotas(docs, domainCol, alpha, budget)
    val maxQuota = quotasDf.select(max(col("quota")))
      .collect().headOption.flatMap(r => Option(r.get(0))) match {
      case Some(q: Long) => q
      case _             => 0L // empty corpus: nothing to draw
    }
    ensureGroupLimitThreshold(docs, maxQuota)
    val quotas = quotasDf.select(col("domain").as("__dom"), col("quota"))
    val w = Window.partitionBy(col("__dom"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    docs.select(col(idCol), col(domainCol).as("__dom"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= lit(maxQuota))
      .join(broadcast(quotas), Seq("__dom"))
      .filter(col("__rk") <= col("quota"))
      .select(col(idCol), col("__dom").as("domain"), col("quota"))
  }

  /** Length-bucketed batch packing — the `group_by_length` trick of every
    * large-scale trainer (fairseq/HF): batches pad every sequence to the
    * batch maximum, so batching SIMILAR lengths together is pure saved
    * FLOPs. Sequences are truncated at `maxLen`, binned by
    * `n_tokens div binWidth`, ordered inside each bin by the reproducible
    * `(md5(id), id)` permutation, and cut into batches of `batchSize`;
    * per batch the exact padding arithmetic comes out as
    * `padded_tokens = n_seqs · max_len` vs `sum_tokens` — all integers.
    * A degenerate single bin (`binWidth > maxLen`) is the random-batching
    * baseline, so the padding saved is directly measurable.
    *
    * Scale shape: one tokenCount scan, then a distributed sort keyed by
    * (bin, md5(id)) — the one total order batch cutting inherently needs;
    * Spark range-partitions it, no task holds more than its partition and
    * nothing reaches the driver. The bin bounds the per-sequence padding
    * at binWidth−1 tokens by construction.
    */
  def lengthBucketBatches(df: DataFrame, idCol: String, textCol: String,
      binWidth: Long, batchSize: Int, maxLen: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    require(maxLen > 0, s"maxLen must be positive, got $maxLen")
    val n = least(
      coalesce(TextFunctions.tokenCount(col(textCol)).cast("long"), lit(0L)),
      lit(maxLen))
    val w = Window.partitionBy(col("bin"))
      .orderBy(md5(col("__id").cast("string")), col("__id"))
    df.select(col(idCol).as("__id"), n.as("n_tokens"))
      .withColumn("bin", expr(s"n_tokens div ${binWidth}L"))
      .withColumn("__rk", row_number().over(w))
      .withColumn("batch_seq", expr(s"(__rk - 1) div $batchSize").cast("long"))
      .groupBy(col("bin"), col("batch_seq"))
      .agg(count(lit(1)).as("n_seqs"),
        max(col("n_tokens")).as("max_len"),
        sum(col("n_tokens")).as("sum_tokens"))
      .withColumn("padded_tokens", col("n_seqs") * col("max_len"))
  }

  /** Deterministic negative sampling for contrastive pairs: for each
    * anchor, the k corpus docs from a DIFFERENT domain ranked first by
    * `md5(anchor:candidate)` — a fresh pseudo-random permutation PER
    * ANCHOR (so anchors don't share negatives systematically), fully
    * reproducible across runs and engines. The standard mining step for
    * contrastive/embedding training data.
    *
    * Scale shape: the anchor set is broadcast (model-scale — dozens to
    * thousands of anchors), the corpus streams through map-side against
    * it (the q25 broadcast-ANN plan shape, BNLJ-by-construction), and the
    * per-anchor rank carries a LITERAL k bound so it plans as a
    * WindowGroupLimit PARTIAL pre-trim: each map partition forwards at
    * most k candidates per anchor, cross-task traffic is
    * anchors × k × partitions — never the pair space.
    */
  def negativeSample(
      anchors: DataFrame, anchorIdCol: String, anchorDomainCol: String,
      corpus: DataFrame, idCol: String, domainCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    ensureGroupLimitThreshold(corpus, k.toLong)
    val a = anchors.select(col(anchorIdCol).as("anchor_id"),
      col(anchorDomainCol).as("__adom"))
    val ord = Seq(
      md5(concat(col("anchor_id").cast("string"), lit(":"),
        col(idCol).cast("string"))),
      col(idCol))
    corpus.select(col(idCol), col(domainCol).as("__cdom"))
      .crossJoin(broadcast(a))
      .filter(col("__cdom") =!= col("__adom"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("anchor_id")).orderBy(ord: _*)))
      .filter(col("__rk") <= lit(k))
      .select(col("anchor_id"), col(idCol).as("negative_id"),
        col("__cdom").as("negative_domain"), col("__rk").cast("long").as("rank"))
  }

  /** Weighted reservoir sample WITHOUT replacement, k items, inclusion
    * probability proportional to `weight` — Efraimidis–Spirakis A-Res
    * ("Weighted random sampling with a reservoir", IPL 2006): draw
    * u_i ∈ (0,1] per item, keep the k largest u_i^(1/w_i), equivalently the
    * k largest ln(u_i)/w_i. Training pipelines use this shape for
    * importance-weighted corpus draws (e.g. keep 1M docs ∝ quality score).
    *
    * Determinism: u_i is not a PRNG draw but a pure function of the id —
    * the low 48 bits of `xxhash64(cast(id as string))` mapped to (0,1] —
    * so the sample is reproducible across runs, partitionings, and engines
    * (the oracle replays the same bits via the DuckDB xxh64 restatement).
    *
    * Scale shape: `orderBy(key).limit(k)` compiles to Spark's
    * TakeOrderedAndProject — each task keeps a size-k heap and the driver
    * merges #partitions × k candidates, so a 100 TB corpus never sorts
    * globally and never shuffles data rows; the only cross-task traffic is
    * the k-row heads. Weights must be strictly positive.
    */
  /** The A-Res key ln(u)/w (larger = better), with u = (xxh64(id) mod 2^48
    * + 1)/2^48 — a pure function of (id, weight), which is what makes the
    * sample associative: top-k of a union equals union-then-top-k, so the
    * same draw falls out of any batching/arrival order (the streaming
    * reservoir in [[graft.streaming.StreamingSample]] relies on this).
    */
  def aresKey(id: Column, weight: Column): Column = {
    val two48 = 281474976710656L // 2^48
    val u = (pmod(xxhash64(id.cast("string")), lit(two48)).cast("double") + lit(1.0)) /
      lit(two48.toDouble)
    log(u) / weight.cast("double")
  }

  def weightedSample(df: DataFrame, idCol: String, weight: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // ln(u)/w in (-inf, 0]: larger is better; ties broken by id
    val key = aresKey(col(idCol), weight)
    val top = df
      .select(col(idCol), weight.cast("long").as("weight"), key.as("__key"))
      .orderBy(col("__key").desc, col(idCol).asc)
      .limit(k)
    // rank assignment runs on k rows only (post-limit), single task by design
    top
      .withColumn("rank", row_number().over(
        Window.orderBy(col("__key").desc, col(idCol).asc)).cast("long"))
      .select(col(idCol), col("weight"), col("rank"))
  }

  /** Stratified A-Res: an independent weighted k-draw WITHIN each value of
    * `groupCol` (per-domain reservoirs — "keep 10k docs ∝ quality from
    * every source"). Same deterministic key as [[weightedSample]]; the
    * per-group top-k plans as a WindowGroupLimit with a PARTIAL pre-trim,
    * so each map partition forwards at most k rows per group to the one
    * group-key exchange — a giant domain never sorts in one task beyond
    * its pre-trimmed k×partitions survivors (the ANN top-k shape,
    * `PlanAuditSpec`-guarded).
    */
  def weightedSampleByGroup(
      df: DataFrame, idCol: String, groupCol: String,
      weight: Column, kPerGroup: Int): DataFrame = {
    require(kPerGroup >= 1, s"kPerGroup must be >= 1, got $kPerGroup")
    val key = aresKey(col(idCol), weight)
    df.select(col(idCol), col(groupCol), weight.cast("long").as("weight"), key.as("__key"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col("__key").desc, col(idCol).asc)).cast("long"))
      .filter(col("rank") <= kPerGroup)
      .select(col(idCol), col(groupCol), col("weight"), col("rank"))
  }

  /** Leakage-safe train/valid/test split: the split key is the
    * DUPLICATE-GROUP id, not the document, so near-duplicates can never
    * straddle train and test (the contamination a per-doc split like q43
    * silently commits whenever the corpus holds near-dups — a train doc's
    * 99%-identical twin in the test set is memorization measured as
    * generalization). `labels` is any (node, group) relation — e.g.
    * [[graft.operators.ConnectedComponents.labelComponents]] output over
    * near-dup pairs; singletons are their own group, so on a dup-free
    * corpus this degrades to exactly the q43 per-doc split shape.
    *
    * Deterministic and engine-portable: bucket = first 4 md5 nibbles of
    * the group id's decimal string, mod 100 (the q43 arithmetic on the
    * group key). Map-side only — no shuffle beyond what `labels` already
    * carries; every member of a group computes the same bucket locally,
    * so group-atomicity needs no group-level join.
    */
  def groupSplit(labels: DataFrame, groupCol: String,
      trainPct: Int = 80, validPct: Int = 10): DataFrame = {
    require(trainPct > 0 && validPct >= 0 && trainPct + validPct < 100,
      s"split percents must partition [0,100): train=$trainPct valid=$validPct")
    labels
      .withColumn("bucket",
        conv(substring(md5(col(groupCol).cast("string")), 1, 4), 16, 10)
          .cast("long") % 100)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + validPct, "valid")
          .otherwise("test"))
  }
}
