package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.TextHashExpressions

/** Deduplication operators for training-data pipelines, each designed for the
  * 100 TB shape of the problem:
  *
  *  - exact dedup: one hash-aggregate on a content key (group-by shuffle with
  *    map-side partial aggregation; the only full-data shuffle here)
  *  - MinHash + LSH near-dup: signatures are computed map-side with
  *    higher-order array functions (whole-stage codegen, no UDF); candidate
  *    generation shuffles only (band_id, band_hash, doc_id) triples — a tiny
  *    fraction of document bytes — and the final Jaccard verification runs
  *    only on bucket-colliding pairs, never all-pairs
  *  - SimHash: one 64-bit signature per doc map-side; near-dup = Hamming
  *    distance via `bit_count(a XOR b)` on banded buckets
  *
  * All hashing is xxhash64-based and fully deterministic.
  */
object DedupFunctions {
  // Mersenne prime 2^31-1: small enough that (h mod P) * a + b never
  // overflows a long under ANSI arithmetic, large enough for LSH dedup.
  private val P = 2147483647L

  /** Distinct 64-bit shingle hashes of word n-grams — the set on which
    * Jaccard is defined. One JVM loop per doc ([[graft.expressions.ShingleHashes]]);
    * hash values equal `xxhash64(array_join(slice(tokens,i,n), ' '))`.
    */
  def shingleHashes(text: Column, n: Int = 3): Column =
    TextHashExpressions.shingleHashes(TextFunctions.tokens(lower(text)), n)

  /** MinHash signature of length `k` over the shingle-hash set, using the
    * (a*h + b) mod P permutation family (P = 2^31-1) with deterministic
    * constants. One JVM loop per doc ([[graft.expressions.MinHashSig]]).
    */
  def minHashSignature(hashes: Column, k: Int = 32): Column =
    TextHashExpressions.minHashSig(hashes, k)

  /** LSH band keys for a MinHash signature: split into `bands` rows of
    * `rowsPerBand`, hash each band. Two docs collide in a band ⟺ their
    * signatures agree on that whole band.
    */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.as("band"),
        xxhash64(array_join(
          transform(slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)), h => h.cast("string")),
          ",")).as("band_hash")))

  /** Exact Jaccard similarity of two pre-computed shingle-hash sets
    * (JVM hash-set loop per pair — the pair-verification hot path).
    */
  def jaccard(a: Column, b: Column): Column =
    TextHashExpressions.jaccardSim(a, b)

  /** 64-bit SimHash over whitespace tokens: per-token xxhash64, per-bit ±1
    * vote, sign → bit. One JVM loop per doc ([[graft.expressions.SimHash64]]).
    */
  def simHash(text: Column): Column =
    TextHashExpressions.simHash64(TextFunctions.tokens(lower(text)))

  /** Winnowing document sketch (MOSS-style rolling-hash fingerprinting):
    * sorted distinct window-min k-gram hashes; any shared substring of
    * length ≥ k+w−1 yields a common print
    * ([[graft.expressions.WinnowingFingerprints]]).
    */
  def winnowingSketch(text: Column, k: Int = 8, w: Int = 16): Column =
    TextHashExpressions.winnowingFingerprints(lower(text), k, w)

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ---- whole-operator pipelines -----------------------------------------

  /** Exact dedup: keep the lowest-id row per distinct value of `key`.
    * Groups on md5(key), not the raw content: the shuffle moves 32-byte
    * digests instead of multi-KB documents (at 100 TB this is the difference
    * between shuffling the corpus and shuffling 0.1% of it). 128-bit
    * collisions are negligible at any realistic corpus size.
    */
  def dedupExact(df: DataFrame, key: Column, idCol: String): DataFrame = {
    // hash only key types castable to binary (string/binary); group other
    // key types (numeric, struct, ...) directly — same results either way
    val hashable = df.select(key.as("__k")).schema.head.dataType match {
      case org.apache.spark.sql.types.StringType | org.apache.spark.sql.types.BinaryType => true
      case _ => false
    }
    val groupKey = if (hashable) md5(key.cast("binary")) else key
    df.groupBy(groupKey.as("__dedup_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .drop("__dedup_key")
  }

  /** The land-able MinHash signature relation: (id, hashes, sig). At 100 TB
    * this is the table you materialize ONCE (bucketed by id); everything
    * downstream — banding, verification — reads projections of it and never
    * re-touches document text.
    */
  def minHashSignatures(
      df: DataFrame, idCol: String, textCol: String, numHashes: Int = 32): DataFrame =
    df.select(col(idCol).as("id"), shingleHashes(col(textCol)).as("hashes"))
      .withColumn("sig", minHashSignature(col("hashes"), numHashes))

  /** MinHash/LSH near-dup pairs from an already-landed signature relation
    * (the [[minHashSignatures]] schema). Returns (id_a, id_b, jaccard) with
    * id_a < id_b and jaccard ≥ threshold.
    *
    * Scale shape: candidate generation projects the signature table to
    * (id, sig) — with a landed parquet table that is a column-pruned scan
    * that never reads the `hashes` payload — and shuffles ONLY
    * (band, band_hash, id) triples, ~20 bytes/doc/band instead of the
    * payload arrays ×bands. Verification re-joins `hashes` by id, so each
    * payload crosses the wire at most once per side of a surviving
    * candidate pair. The two band sides and the two payload sides are
    * identical subplans on identical keys — Spark's exchange reuse makes
    * each a single shuffle write read twice.
    */
  def nearDupMinHashFromSignatures(
      sigs: DataFrame, threshold: Double = 0.8,
      numHashes: Int = 32, bands: Int = 8): DataFrame = {
    val rowsPerBand = numHashes / bands
    val banded = sigs
      .select(col("id"), explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.band_hash").as("band_hash"))
    val a = banded.as("a")
    val b = banded.as("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()  // a pair may collide in several bands
    val payload = sigs.select(col("id"), col("hashes"))
    candidates
      .join(payload.as("pa"), col("id_a") === col("pa.id"))
      .join(payload.as("pb"), col("id_b") === col("pb.id"))
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("pa.hashes"), col("pb.hashes")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Incremental near-dup: a NEW batch of documents against an
    * already-landed signature corpus (the [[minHashSignatures]] schema) —
    * the daily-ingest shape at 100 TB: corpus text is never re-read, only
    * its (id, sig) projection is re-banded, and corpus `hashes` payloads are
    * fetched by id for colliding candidates only. Returns
    * (new_id, dup_of, jaccard) with jaccard ≥ threshold; a new doc absent
    * from the output is novel w.r.t. the corpus. In-batch duplicates among
    * the new docs themselves are the batch operator's job
    * ([[nearDupMinHashFromSignatures]] over `newSigs`).
    */
  def nearDupMinHashIncremental(
      newDocs: DataFrame, idCol: String, textCol: String,
      corpusSigs: DataFrame,
      threshold: Double = 0.8, numHashes: Int = 32, bands: Int = 8): DataFrame =
    nearDupMinHashIncrementalFromSignatures(
      minHashSignatures(newDocs, idCol, textCol, numHashes),
      corpusSigs, threshold, numHashes, bands)

  /** [[nearDupMinHashIncremental]] with the new batch's signatures already
    * computed (the streaming path computes them once and reuses them for
    * in-batch dedup, corpus dedup, and corpus registration).
    */
  def nearDupMinHashIncrementalFromSignatures(
      newSigs: DataFrame, corpusSigs: DataFrame,
      threshold: Double = 0.8, numHashes: Int = 32, bands: Int = 8): DataFrame = {
    val rowsPerBand = numHashes / bands
    def band(sigs: DataFrame): DataFrame = sigs
      .select(col("id"), explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.band_hash").as("band_hash"))
    val candidates = band(newSigs).as("n")
      .join(band(corpusSigs).as("c"), Seq("band", "band_hash"))
      .select(col("n.id").as("new_id"), col("c.id").as("dup_of"))
      .distinct()
    candidates
      .join(newSigs.select(col("id"), col("hashes")).as("pn"), col("new_id") === col("pn.id"))
      .join(corpusSigs.select(col("id"), col("hashes")).as("pc"), col("dup_of") === col("pc.id"))
      .select(col("new_id"), col("dup_of"),
        round(jaccard(col("pn.hashes"), col("pc.hashes")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** One-call MinHash/LSH near-dup: computes signatures, optionally lands
    * them at `landPath` (parquet — the 100 TB path: the banding stage then
    * column-prunes to (id, sig) at the scan and document text is read
    * exactly once), and verifies candidates by payload re-join.
    */
  def nearDupMinHash(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, numHashes: Int = 32, bands: Int = 8,
      landPath: Option[String] = None): DataFrame = {
    val computed = minHashSignatures(df, idCol, textCol, numHashes)
    val sigs = landPath match {
      case Some(p) =>
        computed.write.mode("overwrite").parquet(p)
        df.sparkSession.read.parquet(p)
      case None => computed
    }
    nearDupMinHashFromSignatures(sigs, threshold, numHashes, bands)
  }

  /** Winnowing (rolling-hash) near-dup pairs: candidate pairs share at least
    * one selected print, verified by sketch Jaccard. `maxDf` discards prints
    * occurring in more than that many docs (stop-grams — common substrings
    * would otherwise create quadratic hot buckets; standard MOSS practice).
    * Scale shape mirrors MinHash: sketches computed map-side, the candidate
    * join moves (print, id) pairs only, sketch payloads re-join by id.
    */
  def nearDupWinnowing(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, k: Int = 8, w: Int = 16,
      maxDf: Int = 50, landPath: Option[String] = None): DataFrame = {
    val computed = df.select(col(idCol).as("id"), winnowingSketch(col(textCol), k, w).as("sketch"))
    // same landing story as MinHash: at scale, materialize sketches once so
    // document text is scanned exactly once and downstream stages read the
    // (id, sketch) projection
    val sketches = landPath match {
      case Some(p) =>
        computed.write.mode("overwrite").parquet(p)
        df.sparkSession.read.parquet(p)
      case None => computed
    }
    val prints = sketches.select(col("id"), explode(col("sketch")).as("p"))
    val rare = prints.join(
      prints.groupBy("p").agg(count(lit(1)).as("df_cnt"))
        .filter(col("df_cnt") <= maxDf).select("p"),
      Seq("p"))
    val candidates = rare.as("a").join(rare.as("b"),
        col("a.p") === col("b.p") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    candidates
      .join(sketches.select(col("id"), col("sketch")).as("sa"), col("id_a") === col("sa.id"))
      .join(sketches.select(col("id"), col("sketch")).as("sb"), col("id_b") === col("sb.id"))
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("sa.sketch"), col("sb.sketch")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash near-dup pairs: bucket by `maxHamming + 1` disjoint bit-bands
    * of the 64-bit signature — a pair within Hamming distance d differs in
    * at most d of the d+1 bands, so it matches exactly on at least one
    * (pigeonhole): recall is COMPLETE for the requested radius, not just
    * d ≤ 3 as with fixed quarters. Verified with bit_count. Avoids the
    * all-pairs product the same way LSH banding does; note the scale trade —
    * larger d means narrower bands (64/(d+1) bits), so buckets get
    * exponentially denser: keep d small on big corpora.
    */
  def nearDupSimHash(
      df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame =
    nearDupBits(df.select(col(idCol), simHash(col(textCol)).as("__sig")),
      idCol, "__sig", maxHamming)

  /** Pigeonhole-banded near-dup over ANY precomputed 64-bit signature
    * column — the [[nearDupSimHash]] core with the signature generation
    * factored out, so perceptual hashes (e.g.
    * [[graft.multimodal.ImageCodec.dHash]]) reuse the same scale shape:
    * maxHamming+1 bands, band-bucket join (never all-pairs), exact
    * `bit_count(xor)` verification on colliding pairs. Returns
    * (id_a, id_b, hamming) with id_a < id_b.
    */
  def nearDupBits(
      df: DataFrame, idCol: String, sigCol: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 31,
      s"maxHamming must be in [0, 31], got $maxHamming (bands need ≥ 2 bits)")
    val nBands = maxHamming + 1
    val widths = Array.tabulate(nBands)(i => 64 / nBands + (if (i < 64 % nBands) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val bandStructs = (0 until nBands).map { b =>
      val mask = if (widths(b) == 64) -1L else (1L << widths(b)) - 1L
      struct(lit(b).as("q"),
        call_function("shiftright", col("sig"), lit(offsets(b))).bitwiseAND(lit(mask)).as("qh"))
    }
    val withSig = df.select(col(idCol).as("id"), col(sigCol).as("sig"))
    val banded = withSig.select(col("id"), col("sig"),
      explode(array(bandStructs: _*)).as("bk"))
      .select(col("id"), col("sig"), col("bk.q").as("q"), col("bk.qh").as("qh"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.q") === col("b.q") && col("a.qh") === col("b.qh") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming(col("a.sig"), col("b.sig")).as("hamming"))
      // filter BEFORE distinct: the Hamming cut is per-row deterministic, so
      // the result is identical and the dedup shuffle only carries survivors
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** N-gram Jaccard near-dup over a blocking key (cheap exact variant used
    * when a safe blocking attribute exists — here: only compare docs whose
    * blocking columns match, so the join is per-block, not all-pairs).
    */
  def nearDupNgramJaccard(
      df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], threshold: Double, n: Int = 2): DataFrame = {
    val withH = df.select(
      (Seq(col(idCol).as("id"), shingleHashes(col(textCol), n).as("hashes")) ++
        blockCols.map(col)): _*)
    val a = withH.as("a")
    val b = withH.as("b")
    val blockCond = blockCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _)
    a.join(b, blockCond && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(jaccard(col("a.hashes"), col("b.hashes")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Edit-distance (Levenshtein) fuzzy near-dup pairs within deterministic
    * blocks — the record-linkage / entity-resolution variant of the blocked
    * dedup family: where the n-gram and cosine paths measure SET overlap,
    * edit distance catches character-level mutations (typos, OCR noise,
    * template fills) that keep most of the token stream intact.
    *
    * Cost model: Levenshtein is O(m·n) per PAIR, so it can never see the
    * raw pair space. Two bounds keep it feasible at 100 TB:
    *  1. blocking — pairs form only inside equal-`blockCols` groups
    *     (equi-join, pair count ≤ Σ block²), the same envelope the Jaccard
    *     and blocked-cosine paths ride;
    *  2. the metric runs on a `prefixLen`-char prefix, capping the DP table
    *     at prefixLen² regardless of document length, and a FREE
    *     length-difference lower bound (|len(a)−len(b)| ≤ maxDist, since
    *     every length delta costs one edit) discards most pairs before any
    *     DP runs — it is a plain comparison Catalyst evaluates first in
    *     the join's conjunct list.
    * Both `levenshtein` evaluations are the engine's codegen'd built-in
    * (identical in DuckDB, so the query is hash-exact: integer distances,
    * no float contract).
    */
  def nearDupEditDistance(
      df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], prefixLen: Int, maxDist: Int): DataFrame = {
    require(blockCols.nonEmpty,
      "nearDupEditDistance requires at least one block column — empty blocks " +
        "would form an unbounded all-pairs product with an O(prefixLen^2) " +
        "metric on every pair")
    require(prefixLen >= 1 && maxDist >= 0,
      s"prefixLen must be >= 1 and maxDist >= 0, got $prefixLen / $maxDist")
    val withP = df.select(
      (Seq(col(idCol).as("id"),
        substring(col(textCol), 1, prefixLen).as("p")) ++ blockCols.map(col)): _*)
    val a = withP.as("a")
    val b = withP.as("b")
    val blockCond = blockCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _)
    val lenGate = abs(length(col("a.p")) - length(col("b.p"))) <= maxDist
    a.join(b, blockCond && col("a.id") < col("b.id") && lenGate)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        levenshtein(col("a.p"), col("b.p")).cast("long").as("edit_dist"))
      .filter(col("edit_dist") <= maxDist)
  }

  /** Train/eval decontamination: for every `docs` row, how many DISTINCT
    * word n-grams it shares with the reference corpus (the eval/benchmark
    * set) — the published pre-training hygiene step (GPT-3 appendix C /
    * PaLM-style n-gram overlap). Returns (id, n_shared) for contaminated
    * docs only.
    *
    * 100 TB shape: the reference side is an eval set — thousands of docs,
    * not terabytes — so its distinct-shingle set is BROADCAST and the train
    * corpus is matched map-side (no shuffle of the 100 TB side; the only
    * shuffle is the per-doc distinct-count aggregation, which carries
    * (id, gram) pairs already filtered down to eval-set hits). Word n-grams
    * are matched as strings here for oracle portability; swap
    * [[shingleHashes]] in for a hashed variant at scale (8 bytes/gram on
    * the wire instead of the gram text).
    */
  /** @param broadcastRef eval sets are typically thousands of docs — tiny
    *        next to the train corpus — so the shingle set broadcasts by
    *        default; pass false for a reference corpus too large to
    *        broadcast (the join then shuffles BOTH gram sides on the gram
    *        key, still never the document text).
    */
  def contaminationNgramOverlap(
      docs: DataFrame, idCol: String, textCol: String,
      ref: DataFrame, refTextCol: String, n: Int = 3,
      broadcastRef: Boolean = true): DataFrame = {
    val refGrams = explodedGrams(ref, Seq.empty, refTextCol, n).distinct()
    val refSide = if (broadcastRef) broadcast(refGrams) else refGrams
    explodedGrams(docs.select(col(idCol).as("id"), col(textCol)), Seq("id"), textCol, n)
      .join(refSide, Seq("gram"), "inner")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared")) // grams are pre-distinct per doc
  }

  // Tokens MUST be materialized into a column before the gram lambda:
  // element_at inside transform() gets no common-subexpression
  // elimination, so referencing tokens(text) directly re-runs the full
  // split+filter per element — measured ~10x on the whole operator.
  // An attribute reference reads the row value once.
  private def gramsFromTokens(t: Column, n: Int): Column =
    // size < n would make sequence() descend — emit no grams instead
    when(size(t) >= n,
      array_distinct(transform(
        sequence(lit(0), size(t) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(t, i + j + 1)): _*))))
      .otherwise(array().cast("array<string>"))

  private def explodedGrams(
      df: DataFrame, keep: Seq[String], textC: String, n: Int): DataFrame =
    df.select(keep.map(col) :+ TextFunctions.tokens(lower(col(textC))).as("__t"): _*)
      .select(keep.map(col) :+ explode(gramsFromTokens(col("__t"), n)).as("gram"): _*)

  /** Decontamination for a reference set too large to broadcast RAW: build
    * a bloom filter over the reference grams (one map-side-combined
    * aggregation into numBits/8 bytes), ship it as a literal, and prefilter
    * train grams MAP-SIDE before the exact gram join — so the shuffle
    * carries only true hits plus the bloom's false positives instead of
    * every train gram. The exact join on survivors removes false
    * positives, and blooms have no false negatives, so the result is
    * EXACTLY [[contaminationNgramOverlap]] — only the wire bytes differ
    * (measured by `graft.tools.BloomProbe` at sf0.1, broadcast disabled:
    * 5.02 → 1.11 shuffle MB, 4.5×, identical 4818-row output).
    */
  def contaminationViaBloom(
      docs: DataFrame, idCol: String, textCol: String,
      ref: DataFrame, refTextCol: String, n: Int = 3,
      numBits: Long = 1L << 22, numHashes: Int = 5): DataFrame = {
    // NOT persisted: the returned frame is lazy, so a persist here has no
    // unpersist point and accumulates executor storage across invocations
    // in a long-lived session (round-6/7 advice). The reference tokenize +
    // distinct is therefore computed twice — once eagerly for the bloom
    // build below, once per caller action as the exact join's right side —
    // a bounded recompute instead of an unbounded leak.
    val refGrams = explodedGrams(ref, Seq.empty, refTextCol, n).distinct()
    val bloomBytes = refGrams
      .agg(SketchFunctions.bloomAgg(col("gram"), numBits, numHashes))
      .head.getAs[Array[Byte]](0)
    explodedGrams(docs.select(col(idCol).as("id"), col(textCol)), Seq("id"), textCol, n)
      .filter(SketchFunctions.bloomMightContain(lit(bloomBytes), col("gram")))
      .join(refGrams, Seq("gram"), "inner") // non-broadcast: the at-scale shape
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Survivor selection — the final stage of a fuzzy-dedup pipeline: given
    * component labels (e.g. [[graft.operators.ConnectedComponents]] over
    * near-dup pairs), keep ONE canonical row per duplicate group, the one
    * maximizing `preference` (ties broken inside the caller's preference
    * expression). Emits every row with its group size and a survivor flag,
    * so callers can either filter to survivors or audit what was dropped.
    *
    * Scale shape: the winner per group is a map-side-combined `max_by`
    * aggregation, NOT a per-group window sort — a pathological giant
    * duplicate group costs a merge of per-partition candidates instead of
    * a single-task sort of the whole group.
    */
  def dedupSurvivors(
      labels: DataFrame, docs: DataFrame, idCol: String,
      preference: Column): DataFrame = {
    val joined = labels.select(col("node").as(idCol), col("component_id"))
      .join(docs, Seq(idCol))
    val groups = joined.groupBy(col("component_id"))
      .agg(count(lit(1)).as("group_size"),
        max_by(col(idCol), preference).as("__graft_surv"))
    joined.join(groups, Seq("component_id"))
      .withColumn("survivor", (col(idCol) === col("__graft_surv")).cast("long"))
      .drop("__graft_surv")
  }

  /** Exact duplicate-span (substring) dedup at whitespace-token
    * granularity — the "ExactSubstr" operator of Lee et al. 2022
    * (*Deduplicating Training Data Makes Language Models Better*): every
    * token span of length `minSpan` that occurs at more than one
    * (doc, position) in the corpus is removed from every occurrence except
    * the globally first one (lowest `(doc_id, pos)`). Unlike doc-level
    * dedup this cuts boilerplate passages REPEATED INSIDE otherwise-unique
    * documents, which is where most training-corpus duplication lives.
    *
    * Matching is case- and whitespace-token-exact (no lowercasing); the
    * rebuilt text is the kept tokens rejoined with single spaces, so
    * original inter-token whitespace is normalized.
    *
    * Scale shape (never all-pairs, all passes linear in corpus tokens):
    *  1. gram occurrences are built IN-ROW with array HOFs (slice +
    *     xxhash64 over a `sequence`), so only (doc, pos, 8-byte hash)
    *     triples — not text — reach the one content shuffle;
    *  2. duplicated-gram detection is a hash groupBy on that 8-byte key
    *     with map-side partial aggregation; the canonical occurrence is
    *     `min(struct(doc, pos))` inside the same pass, and the join back
    *     to occurrences is co-partitioned on the gram hash (exchange
    *     reuse: one shuffle write, read twice);
    *  3. span coverage is a per-doc running count over a
    *     `rowsBetween(-(minSpan-1), 0)` window — positions are dense, so
    *     the row frame is the (cheaper) equivalent of a range frame — and
    *     the final rebuild groupBy reuses the window's hash partitioning.
    * The window sorts one document's tokens per task, which is bounded by
    * the corpus's max document length, not by corpus size. The reference
    * stops at content-hash doc identity (`macros/utils.sql` MD5 keys);
    * span-level dedup is part of the wider pipeline surface this engine
    * targets. Grouping on the 64-bit gram hash instead of the gram text is
    * the q20/minhash trade: negligible collision odds for a ~10^4× smaller
    * shuffle payload.
    *
    * Returns one row per input doc: (idCol, text_dedup, n_tokens,
    * n_removed); docs shorter than `minSpan` tokens pass through whole.
    */
  def exactSubstrDedup(
      df: DataFrame, idCol: String, textCol: String, minSpan: Int = 50): DataFrame = {
    require(minSpan >= 2, s"minSpan must be >= 2, got $minSpan")
    val L = minSpan
    val base = df.select(col(idCol).as("__id"),
      TextFunctions.tokens(col(textCol)).as("__toks"))

    // in-row (pos, gram-hash) structs; empty below L tokens
    val gramStructs = when(size(col("__toks")) >= L,
        transform(sequence(lit(0), size(col("__toks")) - L),
          i => struct(i.as("pos"),
            xxhash64(array_join(slice(col("__toks"), i + 1, lit(L)), " ")).as("gh"))))
      .otherwise(array().cast("array<struct<pos:int,gh:bigint>>"))
    val occ = base.select(col("__id"), explode(gramStructs).as("g"))
      .select(col("__id"), col("g.pos").as("pos"), col("g.gh").as("gh"))

    val dup = occ.groupBy(col("gh"))
      .agg(count(lit(1)).as("__c"),
        min(struct(col("__id"), col("pos"))).as("__first"))
      .filter(col("__c") > 1)

    val badStarts = occ.join(dup, Seq("gh"))
      .filter(struct(col("__id"), col("pos")) =!= col("__first"))
      .select(col("__id"), col("pos"), lit(1).as("__bad"))

    // _outer keeps zero-token docs as one (null, null) row, so every input
    // doc reaches the output without a separate restore join/scan
    val toks = base
      .select(col("__id"), posexplode_outer(col("__toks")))
      .toDF("__id", "pos", "tok")

    // a token is covered iff some duplicated non-canonical span starts in
    // the last L-1 positions (or at it); positions are dense per doc
    val frame = Window.partitionBy(col("__id")).orderBy(col("pos"))
      .rowsBetween(-(L - 1), 0)
    toks.join(badStarts, Seq("__id", "pos"), "left")
      .withColumn("__cov", count(col("__bad")).over(frame) > 0)
      .groupBy(col("__id"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(when(!col("__cov") && col("tok").isNotNull,
            struct(col("pos"), col("tok"))))),
          s => s("tok"))).as("text_dedup"),
        count(col("tok")).as("n_tokens"),
        sum(col("__cov").cast("long")).as("n_removed"))
      .select(col("__id").as(idCol), col("text_dedup"),
        col("n_tokens"), col("n_removed"))
  }

  /** CCNet-style boilerplate LINE removal (Wenzek et al. 2020 §3.1): a
    * line appearing verbatim in `minDupDocs`+ DISTINCT documents is
    * boilerplate (cookie banners, nav text, copyright footers — the
    * highest-volume crawl noise after tag markup) and is dropped from
    * every document; unique lines survive. Whitespace-only lines are
    * always dropped (they carry no content and would otherwise tie
    * documents together through shared blank lines).
    *
    * Scale shape: one exact distinct-doc count per line value (two-phase
    * hash aggregation — duplicate lines within one doc collapse map-side)
    * and a flag LEFT join of the line relation against the boilerplate
    * lines, co-partitioned on the line value; reassembly plus both
    * counters ride ONE per-doc aggregation whose in-group work is bounded
    * by the document's own line count. Matching is by the raw line STRING
    * (not a 64-bit
    * hash): the join key IS the shuffle payload here, and exact equality
    * keeps the operator hash-oracle-able with zero collision caveats.
    *
    * Returns one row per doc that keeps >= 1 line: (idCol, clean_text —
    * surviving lines re-joined with '\n' in original order, n_kept,
    * n_dropped). Docs whose every line is boilerplate disappear (they ARE
    * pure boilerplate — the C4/CCNet behavior).
    *
    * `broadcastBoiler = true` ships the post-threshold boilerplate set to
    * every executor instead of co-partition-joining it — removing the
    * second corpus-scale line shuffle entirely (only the count agg and
    * the per-doc reassembly exchange remain). Safe when the boilerplate
    * HEAD is broadcast-sized (a high threshold keeps only the banner/
    * footer head of the line distribution); the default stays the
    * shuffled join, which holds for any threshold.
    */
  def dedupBoilerplateLines(
      df: DataFrame, idCol: String, textCol: String,
      minDupDocs: Int, broadcastBoiler: Boolean = false): DataFrame = {
    require(minDupDocs >= 2, s"minDupDocs must be >= 2, got $minDupDocs")
    val lines = explodeLines(df, idCol, textCol)
    val boiler0 = lines.groupBy(col("__line"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= minDupDocs)
      .select(col("__line"))
    val boiler = if (broadcastBoiler) broadcast(boiler0) else boiler0
    cleanAgainstBoilerplate(df, idCol, textCol, boiler)
      .filter(col("n_kept") > 0)
  }

  /** The non-blank line relation of `df`: (idCol, __idx, __line) — shared
    * by the batch dedup above and the incremental maintenance in
    * [[graft.streaming.CrawlStream]] (which accumulates the per-line
    * distinct-doc counts across waves instead of recomputing them).
    */
  def explodeLines(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("__idx", "__line")))
      .filter(trim(col("__line")) =!= "")

  /** Re-gate docs against an EXTERNALLY supplied boilerplate set
    * (`boiler` must expose `__line`): one flag-join + one per-doc
    * aggregation yields (idCol, clean_text, n_kept, n_dropped) — the
    * [[dedupBoilerplateLines]] core with the count stage factored out, so
    * the streaming maintainer can clean only AFFECTED docs against counts
    * it accumulates incrementally. Rows with n_kept = 0 are KEPT here
    * (the stream upserts them as tombstones; the batch entry point
    * filters them).
    */
  def cleanAgainstBoilerplate(
      df: DataFrame, idCol: String, textCol: String,
      boiler: DataFrame): DataFrame = {
    val lines = explodeLines(df, idCol, textCol)
    val flagged = boiler.select(col("__line"), lit(1).as("__b"))
    // flag-join (not anti-join) so ONE per-doc aggregation yields the
    // cleaned text and both counters without re-scanning the line relation
    lines.join(flagged, Seq("__line"), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("__b").isNull,
            struct(col("__idx"), col("__line"))))),
          s => s.getField("__line")), "\n").as("clean_text"),
        sum(when(col("__b").isNull, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__b").isNotNull, 1L).otherwise(0L)).as("n_dropped"))
  }
}
