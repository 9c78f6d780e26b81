package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Whole-inventory physical-plan audit: the scale contract, asserted.
  * Building a plan is cheap (no job runs for the plan string), so every
  * driver query is checked:
  *  - a CartesianProduct anywhere is a hard failure — O(n*m) never ships;
  *  - BroadcastNestedLoopJoin is allowed ONLY on the allowlisted queries
  *    whose non-equi join is broadcast-by-construction (query-side ANN
  *    fan-out over a literal/broadcast side) and stays O(n * |broadcast|).
  * Queries whose construction runs side-effecting work (streaming
  * refresh, landed indexes) are exercised by their own specs and skipped
  * here only if plan construction itself would block.
  */
class PlanAuditSpec extends SparkSpec {
  // the exact-scoring paths fan a BROADCAST query/centroid set across the
  // corpus (crossJoin(broadcast(...)) by construction): per-row work is
  // O(|broadcast|), no shuffle of the big side — the intended 100 TB shape
  private val bnljAllowed = Set(
    "q25_knn",        // brute-force top-k: broadcast query vectors
    "q48_ann_recall", // includes the brute-force baseline above
    "q56_kmeans_ivf", // recall eval vs brute force over broadcast queries
    "q57_pq_recall",  // ADC + re-rank vs brute force, broadcast tables
    "q71_ivfpq",      // recall report embeds the brute-force baseline
    "q81_hybrid_search", // semantic arm is the broadcast brute-force top-k
    "q89_lm_perplexity", // 1-row broadcast vocab-size attach: the constant
                         // join key folds away, degenerating the hash join
                         // to an NLJ over a single broadcast row — O(n * 1)
    "q93_purged_split",  // fold assignment: crossJoin(broadcast(folds)) by
                         // construction — nFolds-row local table, O(n * k)
    "q99_dsir",          // 1-row broadcast totals attach onto the B-row
                         // model table — O(B * 1), the q89 shape
    "q102_dsir_resample", // embeds q99's model chain (same 1-row attach)
    "q100_sq_topk",      // int8 SQ scoring: broadcast quantized queries,
                         // same crossJoin(broadcast) shape as q25
    "q104_jl_topk",      // JL coarse scoring: broadcast projected queries,
                         // same shape; re-rank is an id equi-join
    "q117_ccnet_select", // embeds q89's scoring chain (the 1-row
                         // broadcast vocab-size attach — O(n * 1))
    "q127_ccnet_predicted", // q117's chain on predicted labels — same
                         // 1-row broadcast vocab-size attach
    "q124_negative_sample", // broadcast anchors × map-side corpus scan,
                         // the q25 shape; group-limit bounds the fan-out
    "q129_bitext_margin", // both kNN directions are q25's broadcast
                         // brute-force shape (crossJoin(broadcast))
    "q134_kn_perplexity", // q89's 1-row broadcast attach, here the (T,V)
                         // type-count frame — O(n * 1)
    "q135_doremi_mix",   // the same 1-row attach in the fused dual
                         // scorer: the (va, vb) vocab-size frame
    "q138_anneal_mix",   // embeds q89's scoring chain (the 1-row
                         // broadcast vocab-size attach — O(n * 1))
    "q156_mmr_topk",     // shortlist stage is q25's broadcast brute-force
                         // shape; all later stages are m-bounded equi-joins
    "q173_hll_estimate", // 1-row broadcast attach of the exact distinct
                         // count onto the 1-row estimator frame — O(1 * 1)
    "q186_decayed_sum",  // 1-row broadcast cutoff-date attach — O(n * 1),
                         // the q89 shape
    "q184_collocations", // 1-row broadcast token-total attach onto the
                         // pair-count relation — O(pairs * 1), q89 shape
    "q187_hll_incremental", // q173's 1-row exact-count attach onto the
                         // 1-row estimator frame — O(1 * 1)
    "q180_binary_ann",   // sign-bit coarse scoring: broadcast coded
                         // queries, the q25/q100 crossJoin(broadcast) shape
    "q174_kmv_setops")   // θ / exact / sketch censuses are all ≤1-row
                         // frames crossJoined at the very end — O(1 * 1);
                         // the below-θ filter is a 1-row broadcast attach
                         // onto the O(parts·k) sketch
  test("inventory audit: no cartesian products; NLJ only where broadcast-by-construction") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) failures += s"$name: CartesianProduct"
        if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed.contains(name))
          failures += s"$name: BroadcastNestedLoopJoin (not allowlisted)"
      } catch { case e: Throwable => failures += s"$name: plan construction failed: ${e.getMessage}" }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("q95 corpus prep stays single-pass: at most 3 shuffle exchanges") {
    // The chunker's carry-through columns let the four pipeline stages ride
    // ONE scan of the corpus with ONE corpus-scale text shuffle; the other
    // two exchanges are the final stats aggregation's two-phase
    // count-distinct on already-chunked (post-reduction) rows — constant
    // small data, not a scale concern. A restructuring that re-joins
    // intermediate stages (losing the carryCols win) would add corpus-scale
    // Exchange nodes and push the count past 3. Broadcast/reused exchanges
    // are excluded: broadcasts are the intended small-side shape and a
    // ReusedExchange reads an already-counted shuffle.
    val plan = SparkEntry.queries("q95_corpus_prep")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // case-insensitive: single-partition shuffles print as
    // "Exchange SinglePartition" — a case-sensitive (hash|range|single)
    // never counted them and a regression introducing one would slip by
    val shuffles = raw"(?mi)^\s*(?:\+- |:- |\s)*Exchange (hash|range|single)"
      .r.findAllIn(plan).size
    assert(shuffles <= 3, s"q95 grew to $shuffles shuffle exchanges:\n$plan")
  }

  test("q90 survivor selection never sorts inside per-group aggregation") {
    // survivor pick is a map-side-combined max_by aggregation; a
    // restructuring through row_number()/rank() would plan a Sort inside
    // each (possibly giant) duplicate group — the single-task wall the
    // design avoids. A Sort feeding a Window over the group key is the
    // signature to reject; the iterative CC rounds inside q90 are
    // aggregations and broadcast joins only.
    val plan = SparkEntry.queries("q90_dedup_survivors")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"q90 grew a window (group-sort) in its survivor path:\n$plan")
  }

  test("ANN top-k windows keep the partial group-limit (hot-key bound)") {
    // row_number() <= k must plan as WindowGroupLimit Partial/Final: each
    // map partition pre-trims to k rows per query before the exchange, so
    // a hot query key receives at most k x partitions candidates. Guards
    // against restructurings that silently lose the rank-limit pushdown.
    // The mixing draws (q68/q92/q107) are in the list because their
    // dominant domain is exactly the hot key α-sampling exists to tame:
    // losing the literal pre-trim re-grows the single-task full-domain
    // sort (the round-10 q107 finding).
    for (q <- Seq("q25_knn", "q26_knn_lsh", "q103_stratified_sample",
        "q68_domain_mix", "q92_token_budget_mix", "q107_temperature_mix",
        "q119_epoch_order", "q122_domain_gate", "q124_negative_sample")) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
        s"$q lost the partial window group limit:\n$plan")
    }
  }

  test("crawl extraction queries stay exchange-free (pure scan→map)") {
    // q110 (WARC parse → extract → gate) and q113 (HTML metadata) are the
    // scan-stage claim behind SCALEPROBE's 0-shuffle-bytes rows: all work
    // is flatMap/regex/HOF projection. Any Exchange here means extraction
    // grew a shuffle — at crawl scale that is a new corpus-wide stage.
    for (q <- Seq("q110_warc_extract", "q113_html_meta")) {
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      val shuffles = raw"(?mi)^\s*(?:\+- |:- |\s)*Exchange (hash|range|single)"
        .r.findAllIn(plan).size
      assert(shuffles == 0, s"$q grew $shuffles shuffle exchange(s):\n$plan")
    }
  }

  test("q118 shard export shuffles the corpus exactly once") {
    // the bucket-hash exchange is the ONE full-data shuffle deterministic
    // packing needs; the manifest aggregation must reuse that
    // partitioning (grouping on (bucket, shard_seq) is satisfied by
    // hash(bucket)) — a second Exchange means the export doubled its
    // corpus-wide traffic
    val plan = SparkEntry.queries("q118_shard_export")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val shuffles = raw"(?mi)^\s*(?:\+- |:- |\s)*Exchange (hash|range|single)"
      .r.findAllIn(plan).size
    assert(shuffles == 1, s"q118 must shuffle exactly once, saw $shuffles:\n$plan")
  }

  test("q123 publish composition holds at two exchanges") {
    // gate is scan-side, exact dedup is the text shuffle, packing is the
    // bucket shuffle, and the manifest aggregation reuses the bucket
    // partitioning — raw docs to publishable shards in exactly two
    // corpus-wide exchanges; a third means a stage regressed
    val plan = SparkEntry.queries("q123_publish")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val shuffles = raw"(?mi)^\s*(?:\+- |:- |\s)*Exchange (hash|range|single)"
      .r.findAllIn(plan).size
    assert(shuffles == 2, s"q123 must shuffle exactly twice, saw $shuffles:\n$plan")
  }

  test("plan shapes are order-independent of the sampling threshold raise") {
    // The sampling operators raise `windowGroupLimitThreshold` session-wide
    // (raise-only, documented in Sampling.ensureGroupLimitThreshold), so in
    // a shared-session bench every query planned AFTER a large mixing draw
    // sees a raised threshold. This pins the round-12 watch items (q82,
    // q117 — the queries whose bench times moved without code changes):
    // their physical plans must be IDENTICAL whether planned at the default
    // threshold or after a huge raise, i.e. the conf mutation cannot be the
    // mechanism behind their elevation. Expression ids and temp scratch
    // paths are normalized (fresh per construction by design).
    val key = "spark.sql.optimizer.windowGroupLimitThreshold"
    def planOf(q: String): String =
      SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString
        .replaceAll("#\\d+", "#x")
        .replaceAll("plan_id=\\d+", "plan_id=x")
        .replaceAll("lambda x_\\d+", "lambda x_n") // session-global counter
        .replaceAll("file:[^\\s,\\)\\]]+", "file:X")
        .replaceAll("\\d+ paths", "N paths")
    val before = spark.conf.get(key, "1000")
    try {
      spark.conf.set(key, "1000")
      val pristine = Seq("q82_feature_profile", "q117_ccnet_select")
        .map(q => q -> planOf(q))
      spark.conf.set(key, "50000000") // what a large mixing draw leaves behind
      pristine.foreach { case (q, p) =>
        val raised = planOf(q)
        assert(raised == p,
          s"$q plans differently under a raised $key:\n--- default ---\n$p\n--- raised ---\n$raised")
      }
    } finally spark.conf.set(key, before)
  }

  test("q127 physical plan is pinned (golden file): any shape drift fails here") {
    // VERDICT r13 what's-wrong #2: q127's bench time moved 1.26 → 2.11 s
    // round-over-round with zero changes to its chain. The r14 root-cause
    // (SURVEY §8.6): the physical plan is bit-identical to the r12
    // build's (verified against a 56b0711 worktree — the only diff is
    // JVM array identity hashes inside langidscoresexpr), the
    // conf-restore/leak hypothesis is disproven by measurement (a leaked
    // raised windowGroupLimitThreshold does not change the plan and
    // does not speed the query), and r12's OWN binary measures 1.98 s
    // isolated on the r14 host — the committed movement is a host-era
    // effect on this allocation-heavy composite, not a code regression.
    // This golden file makes the plan-invariance half a STANDING
    // invariant: a future change that drifts q127's plan shape fails
    // here by diff instead of surfacing as an unexplained bench move.
    // After an INTENDED plan change, regenerate with
    //   GRAFT_REGEN_PLAN=1 sbt "testOnly graft.queries.PlanAuditSpec"
    val norm = SparkEntry.queries("q127_ccnet_predicted")(spark, sfDir)
      .queryExecution.executedPlan.toString
      .replaceAll("#\\d+", "#x")
      .replaceAll("plan_id=\\d+", "plan_id=x")
      .replaceAll("lambda x_\\d+", "lambda x_n")
      .replaceAll("@[0-9a-f]+", "@x") // JVM identity hashes (weight arrays)
      .replaceAll("file:[^\\s,\\)\\]]+", "file:X")
      .replaceAll("/tmp/[^\\s,\\)\\]]+", "/TMP")
      .replaceAll("\\d+ paths", "N paths")
    val golden = java.nio.file.Paths.get(
      "src/test/resources/plans/q127_executedPlan.txt")
    if (sys.env.contains("GRAFT_REGEN_PLAN")) {
      java.nio.file.Files.createDirectories(golden.getParent)
      java.nio.file.Files.write(golden, norm.getBytes("UTF-8"))
      ()
    } else {
      assert(java.nio.file.Files.exists(golden),
        s"golden plan file missing: $golden — regenerate with GRAFT_REGEN_PLAN=1")
      val want = new String(java.nio.file.Files.readAllBytes(golden), "UTF-8")
      assert(norm == want,
        "q127's physical plan drifted from the pinned shape — if intended, " +
          "regenerate with GRAFT_REGEN_PLAN=1; first differing line: " +
          norm.linesIterator.zip(want.linesIterator).zipWithIndex
            .collectFirst { case ((a, b), i) if a != b => s"#$i\n  now: $a\n  pin: $b" }
            .getOrElse("(length differs)"))
    }
  }

  test("q98 weighted sample never sorts globally: TakeOrderedAndProject plan") {
    // orderBy(key).limit(k) must stay a TakeOrderedAndProject (per-task
    // size-k heaps, k-row heads as the only cross-task traffic) — a
    // restructuring through a global Sort + Limit would shuffle every
    // candidate row and break the operator's 100 TB contract
    val plan = SparkEntry.queries("q98_weighted_sample")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"q98 lost the TakeOrderedAndProject top-k:\n$plan")
  }
}
