package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.expressions.VecDot

/** Product quantization (PQ) for approximate nearest-neighbor search —
  * the memory side of the ANN story (IVF/LSH bound the candidate SCAN;
  * PQ bounds the candidate BYTES). Jegou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011.
  *
  * A unit-normalized vector is split into `m` subvectors; each subspace has
  * its own `ks`-centroid codebook, and a vector is stored as its m per-
  * subspace code indices. With m=8, ks=16 the whole vector packs into ONE
  * 32-bit int — 64× smaller than 64 float32 components — so at 100 TB the
  * candidate side of a scan shrinks from vector payloads to a scalar column
  * the parquet reader vectorizes trivially, and a billion-vector index fits
  * in a few GB of executor cache.
  *
  * Query scoring is asymmetric distance computation (ADC): the query stays
  * exact; its dot product against every codebook centroid is precomputed
  * into an m×ks distance table (driver-side, model-scale), and a candidate's
  * approximate cosine is the sum of m table lookups — per row: m shifts,
  * m masks, m `element_at`s against a broadcast literal array, all
  * codegen'd builtins, zero shuffle before the final top-k window.
  *
  * Training is Lloyd's per subspace, but ALL m subspaces train in ONE pass
  * per iteration: encode map-side, explode to (subspace, code, position,
  * component), one map-side-combined hash agg of exact-decimal partial sums
  * (order-independent ⇒ the model is bit-identical across runs and
  * partitionings), then a ≤ m·ks·subDim-row collect rebuilds the codebooks.
  */
object ProductQuantization {

  /** codebooks(j)(k) = centroid k of subspace j, length subDim each. */
  final case class PqModel(m: Int, ks: Int, subDim: Int,
      codebooks: Array[Array[Array[Double]]]) {
    require(ks <= 16 && m * 4 <= 32, s"codes must pack into an int: m=$m ks=$ks")
  }

  private def subVec(v: Column, j: Int, subDim: Int): Column =
    slice(v, j * subDim + 1, subDim)

  /** Per-subspace nearest-centroid code for the UNIT vector v/nrm,
    * maximizing dot(v,c)/nrm − ½‖c‖² (≡ L2 argmin on the normalized
    * vector, without materializing it — no higher-order functions, every
    * dot is a codegen'd [[VecDot]] against a literal). Ties go to the
    * lowest code. The same zero-shuffle struct-sort shape as the IVF
    * assignment.
    */
  private def codeFor(v: Column, nrm: Column, j: Int, model: PqModel): Column = {
    val scored = model.codebooks(j).map { c =>
      val half = 0.5 * c.foldLeft(0.0)((a, x) => a + x * x)
      VecDot(subVec(v, j, model.subDim), typedLit(c)) / nrm - lit(half)
    }
    // argmax via array_position(arr, array_max(arr)): ties go to the first
    // (lowest) code, and the identical `arr` subtrees are evaluated once
    // (codegen subexpression elimination) — cheaper than a struct sort
    val arr = array(scored.toIndexedSeq: _*)
    (array_position(arr, array_max(arr)) - 1).cast("int")
  }

  /** All m codes packed into one int: code_j occupies bits [4j, 4j+4).
    * `nrm` must be the row's vector norm held in a real column, so it is
    * evaluated once per row, not once per (subspace × centroid) score.
    */
  private def packedCodes(v: Column, nrm: Column, model: PqModel): Column =
    (0 until model.m).map(j => shiftleft(codeFor(v, nrm, j, model), 4 * j))
      .reduce((a, b) => a.bitwiseOR(b))

  /** Convenience single-column encoder (norm recomputed inline — prefer
    * projecting the norm into a column and calling the operators below when
    * encoding at scale).
    */
  def encode(model: PqModel)(vec: Column): Column =
    packedCodes(vec, sqrt(VecDot(vec, vec)), model)

  /** Exact model (de)serialization via IEEE-754 long bits, so a persisted
    * index reproduces in-memory codes bit-for-bit.
    */
  def modelToJson(model: PqModel): Array[Byte] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("m", model.m); root.put("ks", model.ks); root.put("subDim", model.subDim)
    val cbs = root.putArray("dbits")
    model.codebooks.foreach(_.foreach(_.foreach(x =>
      cbs.add(java.lang.Double.doubleToLongBits(x)))))
    mapper.writeValueAsBytes(root)
  }

  def modelFromJson(bytes: Array[Byte]): PqModel = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    import scala.jdk.CollectionConverters._
    val root = mapper.readTree(bytes)
    val m = root.get("m").asInt(); val ks = root.get("ks").asInt()
    val subDim = root.get("subDim").asInt()
    val flat = root.get("dbits").elements().asScala
      .map(b => java.lang.Double.longBitsToDouble(b.asLong())).toArray
    require(flat.length == m * ks * subDim, "corrupt PQ model")
    val cbs = Array.tabulate(m, ks) { (j, k) =>
      flat.slice((j * ks + k) * subDim, (j * ks + k + 1) * subDim) }
    PqModel(m, ks, subDim, cbs)
  }

  /** Per-query flat ADC dot table (entry j·ks+k = dot of the query's j-th
    * unit-subvector with codebook(j)(k)) — the broadcastable query side of
    * ADC scoring. Exposed for composed indexes (IVF-PQ).
    */
  def queryTables(queries: DataFrame, qidCol: String, vecCol: String,
      model: PqModel): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val qRows = queries.select(col(qidCol).cast("long"), col(vecCol)).collect().map { r =>
      val v = r.getSeq[Float](1).toArray.map(_.toDouble)
      val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
      val q = v.map(_ / n)
      val dt = Array.tabulate(model.m * model.ks) { i =>
        val (j, kk) = (i / model.ks, i % model.ks)
        val c = model.codebooks(j)(kk)
        var s = 0.0
        var d = 0
        while (d < model.subDim) { s += q(j * model.subDim + d) * c(d); d += 1 }
        s
      }
      (r.getLong(0), dt)
    }
    qRows.toSeq.toDF("query_id", "__dt")
  }

  /** ADC score of a packed-code column against a `__dt` table column —
    * m element_at lookups, codegen'd. Exposed for composed indexes.
    */
  def adcScore(dt: Column, codes: Column, model: PqModel): Column =
    (0 until model.m).map { j =>
      element_at(dt,
        (lit(j * model.ks) +
          shiftright(codes, 4 * j).bitwiseAND(lit(15)) + lit(1)).cast("int"))
    }.reduce(_ + _)

  /** Deterministic init: subvectors of the `ks` lowest-id vectors.
    * Fails fast with a readable message on degenerate input — an empty or
    * too-small table (seeding needs `ks` distinct vectors) or a NULL /
    * zero-norm seed vector (normalizing it would silently poison every
    * centroid of every subspace with NaN).
    */
  private def seedModel(
      df: DataFrame, idCol: String, vecCol: String, m: Int, ks: Int): PqModel = {
    val seed = df.select(col(idCol), col(vecCol)).orderBy(col(idCol)).limit(ks)
      .collect()
    require(seed.length >= ks,
      s"PQ training needs at least ks=$ks vectors to seed the codebooks; " +
        s"'$vecCol' has only ${seed.length} row(s)")
    val rows = seed.map { r =>
      require(!r.isNullAt(1), s"PQ training: NULL '$vecCol' in seed row id=${r.get(0)}")
      r.getSeq[Float](1).toArray.map(_.toDouble)
    }
    val dim = rows.head.length
    require(rows.forall(_.length == dim),
      s"PQ training: ragged '$vecCol' — seed vectors have differing lengths")
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
      require(n > 0.0 && !n.isNaN,
        s"PQ training: zero-norm or non-finite seed vector in '$vecCol' " +
          "(cannot be unit-normalized)")
      v.map(_ / n)
    }
    val cbs = Array.tabulate(m, ks) { (j, k) =>
      unit(rows(k)).slice(j * subDim, (j + 1) * subDim)
    }
    PqModel(m, ks, subDim, cbs)
  }

  def train(df: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, ks: Int = 16, iters: Int = 3): PqModel = {
    var model = seedModel(df, idCol, vecCol, m, ks)
    val nv = df.select(col(vecCol).as("__v"))
      .withColumn("__n", sqrt(VecDot(col("__v"), col("__v")))).persist()
    try {
      for (_ <- 1 to iters) {
        // one exploded pass re-estimates every subspace's codebook at once:
        // (j, code, component position, component) → exact-decimal partial
        // sums, map-side combined, ≤ m·ks·subDim result rows. The codes are
        // materialized behind a cache boundary BEFORE the explode: a plain
        // projection splits the m×ks dot expressions across codegen methods
        // fine, but inlined into the Generate's consume path they exceed
        // janino's method limit and the whole stage falls back to
        // interpreted eval.
        val coded = nv.select(col("__v"), col("__n"),
          array((0 until m).map(j => codeFor(col("__v"), col("__n"), j, model)): _*)
            .as("__codes")).persist()
        val tagged = coded.select(col("__v"), col("__n"),
          posexplode(col("__codes")).as(Seq("__j", "__code")))
          .select(col("__j"), col("__code"), col("__n"),
            posexplode(expr(s"slice(__v, __j * ${model.subDim} + 1, ${model.subDim})"))
              .as(Seq("__pos", "__x")))
        val sums =
          try tagged
            .groupBy(col("__j"), col("__code"), col("__pos"))
            // the component of the NORMALIZED vector: divide before summing
            .agg(sum((col("__x").cast("double") / col("__n")).cast(DecimalType(20, 10)))
              .as("__sum"),
              count(lit(1)).as("__cnt"))
            .collect()
          finally coded.unpersist(blocking = false)
        val next = model.codebooks.map(_.map(_.clone()))
        sums.foreach { r =>
          next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
            r.getDecimal(3).doubleValue() / r.getLong(4).toDouble
        }
        model = PqModel(m, ks, model.subDim, next) // emptied code keeps previous
      }
      model
    } finally nv.unpersist(blocking = false)
  }

  /** ADC approximate top-k cosine. Queries stay exact (small, broadcast —
    * the same assumption the brute-force baseline makes); candidates are
    * their packed codes only. Per (query, candidate): m table lookups into
    * the query's literal m×ks dot table.
    */
  /** @param rerank when > 0: keep the top-`rerank` ADC candidates per query,
    *   then re-score exactly against the true vectors and keep top-k of
    *   that — the production PQ shape: the full scan touches only the 4-byte
    *   codes, and per query just `rerank` true vectors are fetched (an
    *   id-equi join) for exact scoring. Output column is then the exact
    *   `cosine`, directly comparable to the brute-force baseline.
    */
  def topK(
      queries: DataFrame, qidCol: String,
      candidates: DataFrame, cidCol: String,
      vecCol: String, k: Int, model: PqModel,
      excludeSelf: Boolean = true,
      rerank: Int = 0): DataFrame = {
    val qdf = broadcast(queryTables(queries, qidCol, vecCol, model))
    val coded = candidates.select(col(cidCol).as("neighbor_id"), col(vecCol).as("__v"))
      .withColumn("__n", sqrt(VecDot(col("__v"), col("__v"))))
      .select(col("neighbor_id"), packedCodes(col("__v"), col("__n"), model).as("__codes"))
    val score = adcScore(col("__dt"), col("__codes"), model)
    val scored = coded.crossJoin(qdf)
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"), round(score, 6).as("adc_cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_cosine").desc, col("neighbor_id").asc)
    if (rerank <= 0) {
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
    } else {
      require(rerank >= k, s"rerank shortlist ($rerank) must be >= k ($k)")
      val shortlist = scored.withColumn("__r", row_number().over(w))
        .filter(col("__r") <= rerank).drop("__r", "adc_cosine")
      val cvec = candidates
        .select(col(cidCol).as("neighbor_id"), col(vecCol).as("__cv"))
        .withColumn("__cn", sqrt(VecDot(col("__cv"), col("__cv"))))
      val qvec = broadcast(queries
        .select(col(qidCol).as("query_id"), col(vecCol).as("__qv"))
        .withColumn("__qn", sqrt(VecDot(col("__qv"), col("__qv")))))
      val exact = shortlist
        .join(cvec, "neighbor_id") // fetches `rerank` true vectors per query
        .join(qvec, "query_id")
        .select(col("query_id"), col("neighbor_id"),
          round(VecDot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 6)
            .as("cosine"))
      val w2 = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id").asc)
      exact.withColumn("rank", row_number().over(w2).cast("long"))
        .filter(col("rank") <= k)
    }
  }
}
