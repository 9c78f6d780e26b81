package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.expressions.VecDot

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths, one semantic:
  *  - brute-force top-k: exact; query side broadcast, candidate side scanned
  *    once — at 100 TB the scan is the cost and it parallelizes perfectly
  *    (no shuffle of candidates; the final per-query top-k window moves only
  *    scored rows)
  *  - LSH-bucketed (random-hyperplane signs): approximate; candidates are
  *    joined to queries only within matching sign-buckets, trading recall
  *    for a candidate set ~ N / 2^bits per query
  *
  * Hot-loop design: all pair scoring goes through [[VecDot]] (codegen'd
  * fused loop, double accumulation, left-to-right — bitwise-equal to
  * DuckDB's list_sum fold, so oracles agree). Norms are computed ONCE per
  * row in a pre-join projection and carried as scalar columns; the join
  * never re-evaluates a per-element expression besides the single dot.
  *
  * Skew: every per-query top-k here is a `row_number() <= k` window, which
  * Spark 4 plans as WindowGroupLimit Partial/Final — each map partition
  * pre-trims to k rows per query BEFORE the exchange, so a hot query key
  * receives at most k × partitions candidates, never its full candidate
  * set (asserted against the executed plan in `PlanAuditSpec`).
  */
object Similarity {

  def dot(a: Column, b: Column): Column = VecDot(a, b)

  def norm(a: Column): Column = sqrt(VecDot(a, a))

  /** One-off cosine (per-row use; for pair scoring prefer the pre-normed
    * path the operators below use).
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force top-k cosine neighbors.
    *
    * @param queries    (qidCol, vecCol) — small side, broadcast
    * @param candidates (cidCol, vecCol) — large side, scanned
    * Ranking is on cosine rounded to 6 dp with id tie-break, so the result
    * set is stable under floating-point noise.
    */
  def bruteForceTopK(
      queries: DataFrame, qidCol: String,
      candidates: DataFrame, cidCol: String,
      vecCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(qidCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__qn", norm(col("__qv")))
    val c = candidates.select(col(cidCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
    val joined = c.crossJoin(broadcast(q))
    val scored = joined
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 6).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Maximal Marginal Relevance diversified top-k (Carbonell & Goldstein
    * 1998) — the retrieval shape RAG pipelines want when plain top-k
    * returns k near-copies of the same passage: greedily pick the
    * candidate maximizing `λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)` so each
    * pick is relevant AND far from what is already selected.
    *
    * Exact-integer contract: relevance and pair similarities are round6
    * cosines quantized to BIGINT micros (`floor(cos·10⁶ + 0.5)`), λ is an
    * integer permille, so the objective `λ·rel6 − (1000−λ)·maxsim6` and
    * its (objective desc, id asc) tie-break are pure BIGINT arithmetic —
    * the whole greedy restates hash-exactly in portable SQL.
    *
    * Scale shape: stage 1 is the [[bruteForceTopK]] scan (broadcast
    * queries, one candidate pass, per-task heaps); everything after runs
    * on the PARAMETER-BOUNDED shortlist — pair cosines are a per-query
    * m×m self-join of the m-row shortlist (Q·m² rows total, never
    * corpus²), and the k-step greedy executes per query inside ONE
    * `mapGroups` task over its own ≤m(m−1) pair rows. No driver-side
    * data, no iteration over Spark jobs.
    */
  def mmrTopK(
      queries: DataFrame, qidCol: String,
      candidates: DataFrame, cidCol: String,
      vecCol: String, m: Int, k: Int, lambdaPermille: Int): DataFrame = {
    require(m >= 2 && k >= 1 && k <= m, s"need 2 <= k <= m, got k=$k m=$m")
    require(lambdaPermille >= 0 && lambdaPermille <= 1000,
      s"lambdaPermille in [0,1000], got $lambdaPermille")
    val spark = queries.sparkSession
    import spark.implicits._

    val rel6 = floor(col("cosine") * lit(1000000.0) + lit(0.5)).cast("long")
    val short = bruteForceTopK(queries, qidCol, candidates, cidCol, vecCol, k = m)
      .select(col("query_id"), col("neighbor_id"), rel6.as("rel6"))
    val vecs = candidates.select(
      col(cidCol).as("__vid"), col(vecCol).as("__v"), norm(col(vecCol)).as("__n"))
    val withVec = short.join(vecs, col("neighbor_id") === col("__vid"))
      .select(col("query_id"), col("neighbor_id"), col("rel6"),
        col("__v"), col("__n"))
    val a = withVec.select(col("query_id"), col("neighbor_id").as("__ca"),
      col("rel6"), col("__v").as("__va"), col("__n").as("__na"))
    val b = withVec.select(col("query_id").as("__qb"),
      col("neighbor_id").as("__cb"), col("__v").as("__vb"), col("__n").as("__nb"))
    val sim6 = floor(
      round(dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")), 6)
        * lit(1000000.0) + lit(0.5)).cast("long")
    val pairs = a.join(b,
        col("query_id") === col("__qb") && col("__ca") =!= col("__cb"))
      .select(col("query_id"), col("__ca").as("cand"), col("rel6"),
        col("__cb").as("other"), sim6.as("sim6"))

    val lam = lambdaPermille.toLong
    val kk = k
    pairs.as[(Long, Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (q, it) =>
        val rel = scala.collection.mutable.LongMap.empty[Long]
        val sim = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
        it.foreach { case (_, cand, r6, other, s6) =>
          rel(cand) = r6
          sim((cand, other)) = s6
        }
        val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
        val out = Seq.newBuilder[(Long, Long, Long, Long)]
        var rank = 1L
        while (rank <= kk && selected.size < rel.size) {
          var bestId = Long.MinValue
          var bestObj = Long.MinValue
          rel.foreach { case (cand, r6) =>
            if (!selected.contains(cand)) {
              // true max over the selected set (can be negative — an
              // anti-correlated pick REWARDS the candidate); 0 only when
              // nothing is selected yet (the MMR base case)
              var pen = 0L
              if (selected.nonEmpty) {
                pen = Long.MinValue
                selected.foreach { s =>
                  val x = sim((cand, s))
                  if (x > pen) pen = x
                }
              }
              val obj = lam * r6 - (1000L - lam) * pen
              if (obj > bestObj || (obj == bestObj && cand < bestId)) {
                bestObj = obj; bestId = cand
              }
            }
          }
          out += ((q, rank, bestId, bestObj))
          selected += bestId
          rank += 1
        }
        out.result()
      }
      .toDF("query_id", "rank", "vec_id", "objective")
      .sort(col("query_id"), col("rank"))
  }

  /** Deterministic ±1 hyperplane sign matrix (bits × dim), generated
    * driver-side from a seeded splitmix-style hash — no stored model, stable
    * across runs, shipped to executors as literals. `table` seeds an
    * independent matrix per LSH hash table (table 0 is the historical
    * single-table matrix).
    */
  private def signMatrix(bits: Int, dim: Int, table: Int = 0): Array[Array[Double]] =
    Array.tabulate(bits, dim) { (p, d) =>
      var z = p.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xBF58476D1CE4E5B9L +
        table.toLong * 0xD6E8FEB86659FD93L + 0x94D049BB133111EBL
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      if ((z & 1L) == 0L) 1.0 else -1.0
    }

  /** Random-hyperplane signature: bit p = (vec · plane_p) ≥ 0. Each
    * projection is one codegen'd VecDot against a literal plane.
    */
  def rhpSignature(vec: Column, bits: Int, dim: Int, table: Int = 0): Column = {
    val planes = signMatrix(bits, dim, table)
    (0 until bits).map { p =>
      when(dot(vec, typedLit(planes(p))) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Approximate top-k: candidates considered only within the query's
    * sign-bucket, over `tables` independent hash tables (standard LSH
    * recall lever: a true neighbor is found if ANY table buckets it with
    * the query, so recall ≈ 1-(1-p^bits)^tables at ~tables× the candidate
    * volume). (table, bucket) is the join key, so each query touches
    * ~tables·N/2^bits candidates instead of N; signatures are map-side
    * literal projections and a pair colliding in several tables is deduped
    * before scoring.
    *
    * **Regime guidance (measured, `graft.tools.LshTune` →
    * `LSHTUNE_r08.json`).** Random-hyperplane LSH prunes in proportion to
    * how similar true neighbors are: per-bit collision p = 1 − θ/π. On
    * HIGH-similarity workloads (near-dup detection, cos ≳ 0.9 ⇒ p ≳ 0.9)
    * the defaults below reach recall ≈ 1 while scoring a tiny corpus
    * fraction. On weakly-similar corpora (near-orthogonal embeddings,
    * cos ≈ 0.3–0.5 — the q48 harness, deliberately adversarial) ≥0.8
    * recall costs ≥~0.6× the brute-force pair volume (best measured:
    * bits=6, tables=32 → 0.88@5 at 0.58× brute) — at that point prefer
    * the partition-pruned [[ivfTopK]]/IVF-PQ plane, which is this
    * engine's primary ANN scale path and holds 0.92@5 on the same
    * harness at a fraction of the scan.
    */
  def lshTopK(
      queries: DataFrame, qidCol: String,
      candidates: DataFrame, cidCol: String,
      vecCol: String, k: Int, bits: Int = 6, dim: Int = 64,
      tables: Int = 8): DataFrame = {
    def withBuckets(df: DataFrame): DataFrame = df
      .withColumn("__tb", explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), rhpSignature(col(df.columns(1)), bits, dim, t).as("b"))): _*)))
      .withColumn("__t", col("__tb.t")).withColumn("__bucket", col("__tb.b"))
      .drop("__tb")
    val q = withBuckets(
      queries.select(col(qidCol).as("query_id"), col(vecCol).as("__qv")))
      .withColumn("__qn", norm(col("__qv")))
    val c = withBuckets(
      candidates.select(col(cidCol).as("neighbor_id"), col(vecCol).as("__cv")))
      .withColumn("__cn", norm(col("__cv")))
    val joined = c.join(broadcast(q), Seq("__t", "__bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
    // score BEFORE deduping cross-table collisions: a duplicate pair scores
    // identically, so dedup-after-scoring is equivalent — and the dedup
    // shuffle then carries (qid, nid, cosine) scalars, not vector payloads
    val scored0 = joined
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 6).as("cosine"))
    val scored = if (tables == 1) scored0 else scored0.distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Diagnostic companion to [[lshTopK]]: the number of (query, candidate)
    * pairs the bucket join scores for a config, BEFORE cross-table dedup —
    * the work metric to judge a config against brute force's |Q|·N. Used
    * by `graft.tools.LshTune` to decide recall/volume trade-offs.
    */
  def lshCandidatePairs(
      queries: DataFrame, qidCol: String,
      candidates: DataFrame, cidCol: String,
      vecCol: String, bits: Int, dim: Int, tables: Int): Long = {
    def buckets(df: DataFrame, idCol: String): DataFrame = df
      .select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .withColumn("__tb", explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), rhpSignature(col("__v"), bits, dim, t).as("b"))): _*)))
      .select(col("__id"), col("__tb.t").as("__t"), col("__tb.b").as("__bucket"))
    buckets(candidates, cidCol)
      .join(broadcast(buckets(queries, qidCol).withColumnRenamed("__id", "__qid")),
        Seq("__t", "__bucket"))
      .filter(col("__qid") =!= col("__id"))
      .count()
  }

  /** IVF-style approximate top-k: a coarse quantizer (nlist deterministic
    * seed centroids — the lowest-id vectors, no training pass) partitions
    * candidates into inverted lists; each query probes its `nprobe` nearest
    * lists. Scale path: the candidate scan per query is ~N·nprobe/nlist, and
    * the cluster id is a plain join key, so the inverted lists are just a
    * partitioning of the candidate table (at 100 TB: write candidates
    * partitioned by cluster_id once, then every query batch touches only its
    * probed partitions — classic IVF file-skipping).
    */
  /** Deterministic coarse centroids: the nlist lowest-id candidate vectors,
    * collected driver-side — nlist rows are a model parameter (like the LSH
    * sign matrix), not data, so assignment can be a pure projection.
    * Tuples are (centroid_id, vector-as-double, norm).
    */
  private def seedCentroids(
      candidates: DataFrame, cidCol: String, vecCol: String,
      nlist: Int): Array[(Long, Array[Double], Double)] =
    candidates
      .select(col(cidCol).cast("long").as("centroid_id"), col(vecCol).as("cv"))
      .orderBy(col("centroid_id")).limit(nlist)
      .collect()
      .map { r =>
        val v = r.getSeq[Float](1).toArray.map(_.toDouble)
        // same left-to-right double fold as norm()'s VecDot, so the
        // assignment argmax is identical to the executor-side variant
        (r.getLong(0), v, math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x * x)))
      }

  /** Spherical k-means (Lloyd's) training of the IVF coarse quantizer,
    * DataFrame-native. Each iteration is
    *  (a) the zero-shuffle map-side cosine [[assignTo]] against the current
    *      centroid literals,
    *  (b) ONE map-side-combined hash aggregation of per-dimension partial
    *      sums over (centroid_id, dim) — so the shuffle carries at most
    *      nlist×dim×partitions partial rows, never vector payloads,
    *  (c) a nlist×dim collect to rebuild the literals (model-scale, like the
    *      centroids themselves).
    * Initialization is the deterministic [[seedCentroids]]; component sums
    * accumulate as exact decimals (order-independent), so the trained model
    * is bit-identical across runs and partitionings — float doubles summed
    * naively would make the whole index nondeterministic. An emptied cluster
    * keeps its previous centroid (standard Lloyd's fallback).
    */
  def trainCentroids(
      candidates: DataFrame, cidCol: String, vecCol: String,
      nlist: Int, iters: Int): Array[(Long, Array[Double], Double)] = {
    var cents = seedCentroids(candidates, cidCol, vecCol, nlist)
    // every iteration re-scans the candidates; cache the (vector, norm)
    // projection once for the training loop (at 100 TB training runs on a
    // bounded sample, so the cached working set is sample-sized, not corpus-
    // sized)
    val c = candidates.select(col(vecCol).as("__v"))
      .withColumn("__n", norm(col("__v")))
      .persist()
    try for (_ <- 1 to iters) {
      val sums = assignTo(cents)(c, 1)
        .select(col("centroid_id"), posexplode(col("__v")).as(Seq("__pos", "__x")))
        // float → DECIMAL(20,10) is a deterministic per-value rounding; the
        // decimal SUM is then exact and order-independent (same trick as the
        // oracle-checked aggregates)
        .groupBy(col("centroid_id"), col("__pos"))
        .agg(sum(col("__x").cast(DecimalType(20, 10))).as("__sum"),
          count(lit(1)).as("__cnt"))
        .collect()
      val byList = sums.groupBy(_.getLong(0))
      cents = cents.map { case (id, oldV, oldN) =>
        byList.get(id) match {
          case Some(rows) =>
            val v = oldV.clone()
            rows.foreach { r =>
              v(r.getInt(1)) = (r.getDecimal(2).doubleValue() / r.getLong(3).toDouble)
            }
            (id, v, math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x * x)))
          case None => (id, oldV, oldN) // emptied cluster: keep previous
        }
      }
    } finally c.unpersist(blocking = false)
    cents
  }

  /** Per-row argmax over the nlist literal centroids, entirely map-side —
    * zero shuffle for the assignment stage (the crossJoin+window shape moved
    * N×nlist vector payloads through an exchange just to pick a per-row
    * minimum). Tie-break: sim desc, centroid_id asc (encoded as sort desc on
    * (sim, -centroid_id)). Input df must carry (__v, __n).
    */
  private def assignTo(
      cents: Array[(Long, Array[Double], Double)])(df: DataFrame, n: Int): DataFrame = {
    val simStructs = cents.map { case (id, v, nrm) =>
      struct(
        (dot(col("__v"), typedLit(v)) / (col("__n") * lit(nrm))).as("sim"),
        lit(-id).as("neg_id"))
    }
    df.withColumn("__cent",
        explode(slice(sort_array(array(simStructs.toIndexedSeq: _*), asc = false), 1, n)))
      .withColumn("centroid_id", -col("__cent.neg_id"))
      .drop("__cent")
  }

  /** Score probed (list-joined) candidates and keep each query's top-k. */
  private def probeTopK(listsJoined: DataFrame, k: Int): DataFrame = {
    val scored = listsJoined
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("__qv"), col("__v")) / (col("__qn") * col("__n")), 6).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
    // a query probing p lists can see a neighbor once only (each candidate
    // lives in exactly one list) — no dedup needed
  }

  def ivfTopK(
      queries: DataFrame, qidCol: String,
      candidates: DataFrame, cidCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
      trainIters: Int = 0): DataFrame = {
    val cents =
      if (trainIters > 0) trainCentroids(candidates, cidCol, vecCol, nlist, trainIters)
      else seedCentroids(candidates, cidCol, vecCol, nlist)
    val c = candidates.select(col(cidCol).as("neighbor_id"), col(vecCol).as("__v"))
      .withColumn("__n", norm(col("__v")))
    val cAssigned = assignTo(cents)(c, 1)  // each candidate in 1 list
    val q = queries.select(col(qidCol).as("query_id"), col(vecCol).as("__v"))
      .withColumn("__n", norm(col("__v")))
    val qAssigned = assignTo(cents)(q, nprobe)  // each query probes nprobe lists
      .select(col("query_id"), col("__v").as("__qv"), col("__n").as("__qn"), col("centroid_id"))
    probeTopK(cAssigned.join(broadcast(qAssigned), "centroid_id"), k)
  }

  /** Build a PERSISTED IVF index: every candidate is assigned to its
    * inverted list map-side and written parquet-partitioned by
    * `centroid_id`, with the centroid model stored alongside
    * (`_CENTROIDS.json`, float bits — exact roundtrip). This is the 100 TB
    * deployment shape the inline [[ivfTopK]] doc promises: pay the
    * assignment scan once, then every query batch reads ONLY its probed
    * list partitions (classic IVF file-skipping via partition pruning).
    */
  def ivfIndexWrite(
      candidates: DataFrame, cidCol: String, vecCol: String,
      path: String, nlist: Int = 16, trainIters: Int = 0): Unit = {
    val cents =
      if (trainIters > 0) trainCentroids(candidates, cidCol, vecCol, nlist, trainIters)
      else seedCentroids(candidates, cidCol, vecCol, nlist)
    writeCentroids(path, cents)
    val c = candidates.select(col(cidCol).as("neighbor_id"), col(vecCol).as("__v"))
      .withColumn("__n", norm(col("__v")))
    assignTo(cents)(c, 1)
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(java.nio.file.Paths.get(path, "lists").toString)
  }

  /** Store the ORIGINAL float bits (ints), not doubles: bit-exact model
    * roundtrip, so indexed assignment == inline assignment.
    */
  private def writeCentroids(path: String, cents: Array[(Long, Array[Double], Double)]): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createArrayNode()
    cents.foreach { case (id, v, _) =>
      val n = root.addObject()
      n.put("id", id)
      val bits = n.putArray("fbits")
      v.foreach(x => bits.add(java.lang.Float.floatToIntBits(x.toFloat)))
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "_CENTROIDS.json"), mapper.writeValueAsBytes(root))
  }

  private def loadCentroids(path: String): Array[(Long, Array[Double], Double)] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    import scala.jdk.CollectionConverters._
    mapper.readTree(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path, "_CENTROIDS.json")))
      .elements().asScala.map { n =>
        val v = n.get("fbits").elements().asScala
          .map(b => java.lang.Float.intBitsToFloat(b.asInt()).toDouble).toArray
        (n.get("id").asLong(), v, math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x * x)))
      }.toArray
  }

  /** Incrementally maintain a persisted IVF index: assign NEW vectors with
    * the STORED centroid model (bit-exact float round-trip ⇒ identical
    * assignment to a full rebuild) and append them to their list
    * partitions — O(batch) work, no index rebuild, no reread of existing
    * lists. The streaming-ingest shape: each micro-batch appends its
    * vectors' codes/ids to the probed layout. Centroids drift as the
    * corpus grows; rebuild with training when recall decays — the standard
    * IVF operational trade.
    */
  def ivfIndexAppend(
      newVectors: DataFrame, cidCol: String, vecCol: String, path: String): Unit = {
    val cents = loadCentroids(path)
    val c = newVectors.select(col(cidCol).as("neighbor_id"), col(vecCol).as("__v"))
      .withColumn("__n", norm(col("__v")))
    assignTo(cents)(c, 1)
      .write.mode("append").partitionBy("centroid_id")
      .parquet(java.nio.file.Paths.get(path, "lists").toString)
  }

  /** Query a persisted IVF index ([[ivfIndexWrite]]): queries are assigned
    * map-side against the stored centroid model, and the scan is filtered to
    * the union of probed lists — a partition-column filter, so unprobed list
    * partitions are never read (`PartitionFilters` in the plan). Result rows
    * are identical to [[ivfTopK]] with the same parameters.
    */
  def ivfTopKIndexed(
      queries: DataFrame, qidCol: String, vecCol: String,
      path: String, k: Int, nprobe: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    val cents = loadCentroids(path)
    val q = queries.select(col(qidCol).as("query_id"), col(vecCol).as("__v"))
      .withColumn("__n", norm(col("__v")))
    val qAssigned = assignTo(cents)(q, nprobe)
      .select(col("query_id"), col("__v").as("__qv"), col("__n").as("__qn"), col("centroid_id"))
    // driver-side probed-list set: O(queries × nprobe) ids, a model-scale
    // collect like the centroids themselves — this is what turns the probe
    // into a partition-pruned scan instead of a full-index read
    val probed = qAssigned.select("centroid_id").distinct().collect().map(_.getLong(0))
    val lists = spark.read.parquet(java.nio.file.Paths.get(path, "lists").toString)
      .filter(col("centroid_id").isin(probed.toIndexedSeq: _*))
      .withColumn("centroid_id", col("centroid_id").cast("long"))
    probeTopK(lists.join(broadcast(qAssigned), "centroid_id"), k)
  }

  /** Build a PERSISTED composed IVF-PQ index — the production ANN shape at
    * 100 TB (FAISS's IVFPQ, re-expressed Spark-first): candidates are
    * assigned to inverted lists map-side AND stored as 4-byte PQ codes, so
    * a probe reads only its probed-list PARTITIONS (partition pruning) and
    * within them only ids+codes (~64× smaller than float vectors — the
    * probed scan is both partition-pruned and payload-compressed). The
    * centroid and PQ models land beside the lists with bit-exact
    * serialization.
    */
  def ivfPqIndexWrite(
      candidates: DataFrame, cidCol: String, vecCol: String, path: String,
      nlist: Int = 16, m: Int = 8, ks: Int = 16,
      trainIters: Int = 0, pqIters: Int = 2): Unit = {
    val cents =
      if (trainIters > 0) trainCentroids(candidates, cidCol, vecCol, nlist, trainIters)
      else seedCentroids(candidates, cidCol, vecCol, nlist)
    writeCentroids(path, cents)
    val pq = ProductQuantization.train(candidates, cidCol, vecCol, m, ks, pqIters)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "_PQ.json"), ProductQuantization.modelToJson(pq))
    val c = candidates.select(col(cidCol).as("neighbor_id"), col(vecCol).as("__v"))
      .withColumn("__n", norm(col("__v")))
    assignTo(cents)(c, 1)
      .select(col("neighbor_id"),
        ProductQuantization.encode(pq)(col("__v")).as("__codes"),
        col("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(java.nio.file.Paths.get(path, "lists").toString)
  }

  /** Query a persisted IVF-PQ index: queries assign map-side against the
    * stored centroids, the probed lists load partition-pruned (codes only),
    * ADC scores against broadcast per-query dot tables, and the ADC
    * shortlist optionally re-ranks exactly against `rerankSource` (the
    * original vector table, fetched by id — `rerank` rows per query).
    */
  def ivfPqTopK(
      queries: DataFrame, qidCol: String, vecCol: String, path: String,
      k: Int, nprobe: Int = 4, rerank: Int = 0,
      rerankSource: Option[(DataFrame, String)] = None): DataFrame = {
    val spark = queries.sparkSession
    val cents = loadCentroids(path)
    val pq = ProductQuantization.modelFromJson(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "_PQ.json")))
    val q = queries.select(col(qidCol).as("query_id"), col(vecCol).as("__v"))
      .withColumn("__n", norm(col("__v")))
    val qAssigned = assignTo(cents)(q, nprobe)
      .select(col("query_id"), col("centroid_id"))
    val qTables = ProductQuantization.queryTables(queries, qidCol, vecCol, pq)
    val probed = qAssigned.select("centroid_id").distinct().collect().map(_.getLong(0))
    val lists = spark.read.parquet(java.nio.file.Paths.get(path, "lists").toString)
      .filter(col("centroid_id").isin(probed.toIndexedSeq: _*))
      .withColumn("centroid_id", col("centroid_id").cast("long"))
    val scored = lists
      .join(broadcast(qAssigned), "centroid_id")
      .join(broadcast(qTables), "query_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(ProductQuantization.adcScore(col("__dt"), col("__codes"), pq), 6)
          .as("adc_cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_cosine").desc, col("neighbor_id").asc)
    if (rerank <= 0) {
      scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
    } else {
      require(rerank >= k, s"rerank shortlist ($rerank) must be >= k ($k)")
      val (src, srcId) = rerankSource.getOrElse(
        throw new IllegalArgumentException("rerank > 0 needs rerankSource (id, vectors)"))
      val shortlist = scored.withColumn("__r", row_number().over(w))
        .filter(col("__r") <= rerank).drop("__r", "adc_cosine")
      val cvec = src.select(col(srcId).as("neighbor_id"), col(vecCol).as("__cv"))
        .withColumn("__cn", norm(col("__cv")))
      val qvec = broadcast(queries
        .select(col(qidCol).as("query_id"), col(vecCol).as("__qv"))
        .withColumn("__qn", norm(col("__qv"))))
      val exact = shortlist
        .join(cvec, "neighbor_id")
        .join(qvec, "query_id")
        .select(col("query_id"), col("neighbor_id"),
          round(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 6)
            .as("cosine"))
      val w2 = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id").asc)
      exact.withColumn("rank", row_number().over(w2).cast("long")).filter(col("rank") <= k)
    }
  }

  /** ±1 hyperplane rows as SQL array literals, so an external engine can
    * replicate [[rhpSignature]] bit-for-bit (oracle parity for the LSH
    * path — the planes are compile-time constants, not a trained model).
    */
  def planeLiterals(bits: Int, dim: Int, table: Int = 0): Seq[String] =
    signMatrix(bits, dim, table).toSeq.map(
      _.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]"))

  /** recall@k of an approximate top-k result against the exact one:
    * one row per query — (query_id, n_hits, recall). Both inputs are the
    * (query_id, neighbor_id, …) shape the top-k operators emit.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    val hits = exact.select("query_id", "neighbor_id")
      .join(approx.select("query_id", "neighbor_id"), Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    exact.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / lit(k.toDouble)).as("recall"))
  }

  /** Embedding-cosine near-duplicate pairs within an LSH bucket:
    * (id_a, id_b, cosine) with cosine ≥ threshold, id_a < id_b.
    * Pair count ~ N²/2^bits; pick bits so a bucket's pairs fit a task.
    */
  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup of an
    * embedded corpus — k-means-cluster the embeddings, then near-dup ONLY
    * within each cluster, keeping one representative per duplicate group.
    * The cluster id is the blocking key: the published method's whole point
    * is to restrict the O(N²) pair search to Σ|cluster|² work, with nlist
    * sizing the quadratic term (at 100 TB: nlist grows with N so the
    * expected cluster stays bounded; the only shuffle of vector payloads is
    * the one cluster-keyed self-join, which AQE skew-splits since it IS a
    * join). Items whose cluster contains a lower-id item with cosine >=
    * threshold are removed (keep-min-id is the deterministic stand-in for
    * the paper's arbitrary representative choice).
    *
    * Training reuses the deterministic exact-decimal spherical k-means of
    * the IVF plane, so the whole operator is bit-reproducible.
    *
    * Returns one row per cluster: (centroid_id, n_items, n_kept,
    * n_removed), plus per-item detail via `detail = true`
    * (id, centroid_id, kept).
    */
  def semDedup(
      df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int, threshold: Double,
      detail: Boolean = false): DataFrame = {
    val cents = trainCentroids(df, idCol, vecCol, nlist, iters)
    val items = df
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("__v"))
      .withColumn("__n", norm(col("__v")))
    // NOT persisted: the operator returns a lazy frame, so a persist here
    // has no unpersist point and accumulates executor storage across
    // invocations (round-6/7 advice). The assignment is a zero-shuffle
    // narrow stage (literal-centroid argmax), so its three references
    // (both self-join sides + flagged) cost three map passes and zero
    // held storage.
    val assigned = assignTo(cents)(items, 1)
      .select(col("id"), col("__v"), col("__n"), col("centroid_id"))
    val a = assigned.as("a")
    val b = assigned.as("b")
    val removed = a
      .join(b, col("a.centroid_id") === col("b.centroid_id") && col("b.id") < col("a.id"))
      .filter(
        round(dot(col("a.__v"), col("b.__v")) / (col("a.__n") * col("b.__n")), 6)
          >= threshold)
      .select(col("a.id")).distinct()
    val flagged = assigned
      .join(removed.withColumnRenamed("id", "__rm"),
        col("id") === col("__rm"), "left")
      .select(col("id"), col("centroid_id"),
        col("__rm").isNull.cast("boolean").as("kept"))
    if (detail) flagged
    else flagged
      .groupBy(col("centroid_id"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("kept").cast("long")).as("n_kept"),
        sum((!col("kept")).cast("long")).as("n_removed"))
  }

  /** Exact cosine near-dup pairs within deterministic blocks — the
    * embedding analogue of the blocked n-gram Jaccard dedup: pairs are
    * only formed inside equal-`blockCols` groups (a metadata partition the
    * pipeline already trusts, e.g. a shard or cluster label), so the join
    * is an equi-join on the block key and never an all-pairs product. At
    * 100 TB the pair count is bounded by Σ block², the same envelope the
    * Jaccard and SemDeDup paths ride; recall is exact WITHIN blocks by
    * construction (cross-block near-dups are out of contract, which is
    * what makes this variant oracle-checkable — contrast [[nearDupCosine]]
    * whose sign-bucket blocking is probabilistic).
    *
    * Reference semantics: near-duplicate suppression over embedding
    * columns; cf. dedup coverage driven by the reference's document
    * tests (`tests/functional/test_feature_store.py`).
    */
  def nearDupCosineBlocked(
      df: DataFrame, idCol: String, vecCol: String,
      blockCols: Seq[String], threshold: Double): DataFrame = {
    require(blockCols.nonEmpty,
      "nearDupCosineBlocked requires at least one block column — empty blocks " +
        "would form an unbounded all-pairs product; use nearDupCosine for " +
        "probabilistic (LSH) blocking instead")
    val (id, v, n) = ("__graft_id", "__graft_v", "__graft_n")
    val base = df.select((Seq(col(idCol).as(id), col(vecCol).as(v)) ++
      blockCols.map(col)): _*)
      .withColumn(n, norm(col(v)))
    val a = base.as("a")
    val b = base.as("b")
    a.join(b,
        blockCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _) &&
          col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("id_a"), col(s"b.$id").as("id_b"),
        round(dot(col(s"a.$v"), col(s"b.$v")) / (col(s"a.$n") * col(s"b.$n")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Scalar-quantized (int8) top-k — the symmetric per-dimension
    * quantization every large-scale vector store ships as its first
    * compression tier (FAISS `SQ8`, Milvus/pgvector int8): codes are 1/4
    * the bytes of float32, scores are INTEGER dot products over the codes,
    * and the true metric is recovered by an exact re-rank of the short
    * candidate list when needed.
    *
    * Quantizer: per-dimension symmetric scale s_d = max |v_d| over the
    * candidate corpus (exact agg, order-independent, so bit-identical
    * across engines); code_d = floor(v_d / s_d · 127 + 0.5) ∈ [-127, 127].
    * Every arithmetic step is IEEE-exact (max, divide, multiply, floor),
    * and scores are integers — the whole operator is hash-exact against
    * the DuckDB oracle with NO rounding contract, unlike the cosine paths.
    *
    * Scale shape (100 TB): the scale vector is MODEL-scale (dim doubles,
    * collected once, shipped as literals); quantization is map-side inside
    * the scan stage; scoring reads 1/4 the bytes of the float path and the
    * per-query top-k rides the same broadcast + WindowGroupLimit plan as
    * [[bruteForceTopK]]. Composes with IVF: quantize the residuals inside
    * each partition-pruned list for SQ-within-IVF.
    */
  def scalarQuantizedTopK(
      queries: DataFrame, qidCol: String,
      candidates: DataFrame, cidCol: String,
      vecCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    // per-dim symmetric scales from the candidate corpus; zero-variance
    // dims get scale 1 so the division is total
    val scaleRows = candidates
      .select(posexplode(col(vecCol)).as(Seq("d", "v")))
      .groupBy(col("d")).agg(max(abs(col("v").cast("double"))).as("s"))
      .collect()
    require(scaleRows.nonEmpty,
      "scalarQuantizedTopK: candidate corpus is empty (or vectors are empty) — " +
        "no per-dimension scales can be derived")
    val scales: Array[Double] = scaleRows
      .map(r => (r.getInt(0), r.getDouble(1)))
      .sortBy(_._1)
      .map { case (_, s) => if (s == 0.0) 1.0 else s }
    val quantize: Column => Column = v =>
      zip_with(v, typedLit(scales),
        (x, s) => floor(x.cast("double") / s * lit(127.0) + lit(0.5)).cast("long"))
    val q = queries
      .select(col(qidCol).as("query_id"), quantize(col(vecCol)).as("__qq"))
    val c = candidates
      .select(col(cidCol).as("neighbor_id"), quantize(col(vecCol)).as("__qc"))
    val intDot = aggregate(
      zip_with(col("__qq"), col("__qc"), (x, y) => x * y),
      lit(0L), (acc, x) => acc + x)
    val scored = c.crossJoin(broadcast(q))
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"), intDot.as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Binary-quantization (sign-bit) ANN — the extreme compression tier
    * below [[scalarQuantizedTopK]] (FAISS binary indexes / the "binary
    * embedding" RAG recipe): 1 bit per dimension = ×32 vs float32, so a
    * 100 TB float corpus's codes fit in ~3 TB and the coarse stage scans
    * integers with popcount. Codes pack as TWO 32-bit halves (BIGINT-safe
    * in any engine — no sign-bit edge at dim 64); stage 1 ranks by
    * hamming distance (bit_count of xor, exact integer), stage 2 re-ranks
    * the m-shortlist by the exact scaled-integer dot product
    * Σ round(v·10⁶)·round(u·10⁶) — the whole operator is hash-exact, no
    * rounding contract. Shape = [[bruteForceTopK]]'s broadcast scan +
    * WindowGroupLimit; dims ≤ 64 (one code pair).
    */
  def binaryQuantTopK(
      queries: DataFrame, qidCol: String,
      candidates: DataFrame, cidCol: String,
      vecCol: String, m: Int, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    require(m >= k && k >= 1, s"need m >= k >= 1, got m=$m k=$k")
    // enforce the scaladoc's "dims ≤ 64" contract (ADVICE r14): dims past
    // 64 fall outside both 32-bit code halves, so the coarse hamming stage
    // would silently ignore them while the exact e6 re-rank uses them —
    // a quiet shortlist-recall degradation, not an error. MAX over the
    // whole side (ADVICE r15: a first-row probe misses ragged columns and
    // NPEs on a NULL first vector) — one aggregate scan per side, the
    // same cost class as the broadcast build this operator already pays.
    Seq(("queries", queries), ("candidates", candidates)).foreach { case (side, df) =>
      df.agg(max(size(col(vecCol))).as("d")).collect().foreach { r =>
        if (!r.isNullAt(0)) require(r.getInt(0) <= 64,
          s"binaryQuantTopK: $side '$vecCol' has ${r.getInt(0)} dims — the " +
            "sign-bit code holds at most 64; project or chunk the vectors first")
      }
    }
    def half(v: Column, off: Int): Column = aggregate(
      transform(v, (x, i) =>
        when(x.cast("double") > lit(0.0) && i >= off && i < off + 32,
          // 2^(i−off) via pow: exact in IEEE double for exponents < 32
          pow(lit(2.0), (i - lit(off)).cast("double")).cast("long"))
          .otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
    val e6: Column => Column = v =>
      transform(v, x => floor(x.cast("double") * lit(1e6) + lit(0.5)).cast("long"))
    def coded(df: DataFrame, id: String, as: String) = df.select(
      col(id).as(as), half(col(vecCol), 0).as(s"${as}_lo"),
      half(col(vecCol), 32).as(s"${as}_hi"), e6(col(vecCol)).as(s"${as}_e6"))
    val q = coded(queries, qidCol, "query_id")
    val c = coded(candidates, cidCol, "neighbor_id")
    val scored = c.crossJoin(broadcast(q))
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        (expr("bit_count(query_id_lo ^ neighbor_id_lo)") +
          expr("bit_count(query_id_hi ^ neighbor_id_hi)")).cast("long").as("hamming"),
        col("query_id_e6"), col("neighbor_id_e6"))
    val w1 = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("neighbor_id").asc)
    val shortlist = scored.withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= m)
    val dot12 = aggregate(
      zip_with(col("query_id_e6"), col("neighbor_id_e6"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("dot12").desc, col("neighbor_id").asc)
    shortlist.select(col("query_id"), col("neighbor_id"), col("hamming"),
        dot12.as("dot12"))
      .withColumn("rank", row_number().over(w2).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Johnson–Lindenstrauss random projection to `outDim` dims: the
    * Rademacher (±1) construction — proj_p = (v · plane_p)/√outDim with the
    * same seeded sign matrix as the LSH plane (an independent `table` seed),
    * so the transform is a compile-time constant an external engine can
    * replay from [[planeLiterals]]. Map-side, scan-stage codegen, no model.
    *
    * Where [[scalarQuantizedTopK]] shrinks bits-per-dim (×4), JL shrinks
    * DIMS (64 → 16 = ×4 again, composable to ×16) at a distance-distortion
    * bound of O(√(ln n / outDim)) — the standard coarse-scoring tier when
    * the corpus outgrows even int8 scan budgets.
    *
    * Regime guidance (measured, `FunctionsSpec`): the distortion bound only
    * separates neighbors that ARE similar. On planted clusters
    * (cos ≈ 0.95 within) a 16-dim projection + 20-shortlist + exact
    * re-rank recovers ≥45/50 of exact top-5; on the deliberately
    * near-orthogonal `embeddings` harness it recovers ~9/50 — the same
    * low-similarity wall documented on [[lshTopK]]. Near-dup/cluster
    * workloads: use JL; weakly-similar ranking: use [[ivfTopK]]/IVF-PQ.
    */
  def jlProject(vec: Column, outDim: Int, dim: Int, table: Int = 1): Column = {
    val planes = signMatrix(outDim, dim, table)
    val scale = math.sqrt(outDim.toDouble)
    array((0 until outDim).map(p => dot(vec, typedLit(planes(p))) / lit(scale)): _*)
  }

  /** JL shortlist + exact re-rank: dot products over `outDim`-dim
    * projections (rounded 6 dp, the cosine contract) pick `shortlist`
    * candidates per query; the shortlist re-ranks by exact cosine via an
    * id-equi-join back to the full vectors. Same output shape as
    * [[bruteForceTopK]] for direct recall comparison.
    */
  def jlTopKReranked(
      queries: DataFrame, qidCol: String,
      candidates: DataFrame, cidCol: String,
      vecCol: String, k: Int, shortlist: Int,
      outDim: Int = 16, dim: Int = 64): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val q = queries.select(col(qidCol).as("query_id"),
      jlProject(col(vecCol), outDim, dim).as("__qp"))
    val c = candidates.select(col(cidCol).as("neighbor_id"),
      jlProject(col(vecCol), outDim, dim).as("__cp"))
    val coarse = aggregate(
      zip_with(col("__qp"), col("__cp"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), round(coarse, 6).as("__s"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__s").desc, col("neighbor_id").asc)
    val short = scored.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))
    rerankExact(short, queries, qidCol, candidates, cidCol, vecCol, k)
  }

  /** Exact-cosine re-rank of a (query_id, neighbor_id) shortlist: broadcast
    * the queries, equi-join candidates by id (touches shortlist rows, not
    * the corpus), emit [[bruteForceTopK]]'s (query_id, neighbor_id, cosine,
    * rank) shape. Shared by the SQ and JL coarse-scoring tiers.
    */
  private def rerankExact(
      short: DataFrame,
      queries: DataFrame, qidCol: String,
      candidates: DataFrame, cidCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(qidCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__qn", norm(col("__qv")))
    val c = candidates.select(col(cidCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
    val rescored = short
      .join(broadcast(q), Seq("query_id"))
      .join(c, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 6).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    rescored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** SQ shortlist + exact re-rank — the production shape for int8 codes:
    * integer dot products over the 1/4-width codes pick a `shortlist`
    * per query (the only pass that touches every candidate, reading 1/4
    * the bytes), then the shortlist re-ranks by EXACT cosine via an
    * id-equi-join back to the float vectors (touches `shortlist` rows per
    * query, not the corpus). Output matches [[bruteForceTopK]]'s shape so
    * recall is directly comparable; re-ranking also removes the
    * dot-vs-cosine metric gap on unnormalized corpora.
    */
  def sqTopKReranked(
      queries: DataFrame, qidCol: String,
      candidates: DataFrame, cidCol: String,
      vecCol: String, k: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val short = scalarQuantizedTopK(queries, qidCol, candidates, cidCol, vecCol, shortlist)
      .select(col("query_id"), col("neighbor_id"))
    rerankExact(short, queries, qidCol, candidates, cidCol, vecCol, k)
  }

  def nearDupCosine(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int = 12, dim: Int = 64): DataFrame = {
    val withSig = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("n", norm(col("v")))
      .withColumn("bucket", rhpSignature(col("v"), bits, dim))
    val a = withSig.as("a")
    val b = withSig.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(dot(col("a.v"), col("b.v")) / (col("a.n") * col("b.n")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019, the CCMatrix/
    * WikiMatrix parallel-corpus step): a source/target pair is a
    * translation candidate when its cosine stands OUT of both sides'
    * neighborhoods — `margin(x,y) = cos(x,y) / ((avgNN_k(x) + avgNN_k(y)) / 2)`,
    * the "ratio" margin — which suppresses hub vectors that are close to
    * everything (raw cosine's failure mode in cross-lingual spaces).
    * Emits, per source, its best target by (margin, cosine) with
    * `margin >= threshold`.
    *
    * Scale/determinism shape:
    *  - both kNN passes are [[bruteForceTopK]] (broadcast side = the
    *    query set, candidate side scanned once; at corpus scale swap in
    *    the IVF probe path — the margin arithmetic is unchanged);
    *  - neighborhood averages sum the ROUND6 cosines as DECIMAL(20,10)
    *    (the q56 trick) so the sum is partitioning-independent, then one
    *    double division — both engines compute the identical double;
    *  - the final margin is round6; per-source winner ties break by
    *    (margin desc, cosine desc, target id), fully deterministic.
    */
  def bitextMine(
      src: DataFrame, srcIdCol: String,
      tgt: DataFrame, tgtIdCol: String,
      vecCol: String, k: Int, threshold: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val dec = DecimalType(20, 10)
    def nnAvg(queries: DataFrame, qid: String, cands: DataFrame, cid: String,
        outId: String, outAvg: String): DataFrame =
      bruteForceTopK(queries, qid, cands, cid, vecCol, k, excludeSelf = false)
        .groupBy(col("query_id"))
        .agg((sum(col("cosine").cast(dec)).cast("double") / lit(k.toDouble)).as(outAvg))
        .select(col("query_id").as(outId), col(outAvg))
    val fwd = bruteForceTopK(src, srcIdCol, tgt, tgtIdCol, vecCol, k,
      excludeSelf = false)
    val avgS = nnAvg(src, srcIdCol, tgt, tgtIdCol, "__sid", "__avg_s")
    val avgT = nnAvg(tgt, tgtIdCol, src, srcIdCol, "__tid", "__avg_t")
    val margins = fwd
      .join(avgS, col("query_id") === col("__sid"))
      .join(avgT, col("neighbor_id") === col("__tid"))
      .select(col("query_id").as("src_id"), col("neighbor_id").as("tgt_id"),
        col("cosine"),
        round(col("cosine") / ((col("__avg_s") + col("__avg_t")) / lit(2.0)), 6)
          .as("margin"))
    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("margin").desc, col("cosine").desc, col("tgt_id"))
    margins
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1 && col("margin") >= threshold)
      .select(col("src_id"), col("tgt_id"), col("cosine"), col("margin"))
  }
}
