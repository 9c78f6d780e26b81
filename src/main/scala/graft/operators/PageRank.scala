package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-integer PageRank power iteration — the quality-prior feeder the
  * host link graph (q148, [[graft.sources.WarcIO.readWat]]) exists to
  * supply, and the [[ConnectedComponents]] sibling on the same edge
  * relation. CCNet/C4-class pipelines weight or gate documents by a
  * host-level centrality prior; this computes it bit-reproducibly.
  *
  * The iteration is the standard damped walk with uniform dangling-mass
  * redistribution,
  *
  *   p'(i) = 0.15/N · M + 0.85 · ( Σ_{j→i} p(j)/deg(j) + D/N ),
  *
  * kept EXACT in scaled integers (the q56 bit-reproducible-k-means
  * discipline): values carry the denominator `N · F^t` with
  * `F = 100 · N · degLcm`, so one iteration is
  *
  *   P'(i) = 15·degLcm·M + 85·degLcm·D + Σ_{j→i} 85·N·(degLcm/deg(j))·P(j)
  *
  * — all-integer when every out-degree divides `degLcm` (checked; the
  * caller supplies the lcm of the degree multiset its graph actually
  * has). Mass is conserved exactly (Σ P' = F · Σ P — provable by summing
  * the recurrence), so the total M needs NO per-round aggregation: it is
  * the closed form `N · F^t`. Only the dangling sum D is aggregated per
  * round. Integer sums are order- and partitioning-independent, so the
  * result is bit-identical across cluster layouts — restatable as a
  * hash-exact oracle, unlike a floating-point power iteration whose sum
  * order drifts.
  *
  * Scale shape: each round is ONE equi-join of the rank table with the
  * edge list (shuffle on src — co-partitionable with a pre-partitioned
  * edge table at 100 TB), one groupBy(dst) partial-aggregated sum, and
  * one scalar dangling aggregate; per-round state is the rank table
  * (|nodes| rows). Lineage is truncated per round (the dangling action
  * would otherwise recompute a growing chain).
  *
  * Overflow is REFUSED up front, not risked: the conserved total after
  * `iters` rounds is exactly `N · F^iters`, and every partial sum of the
  * non-negative terms is bounded by it, so `N · F^iters ≤ Long.MaxValue`
  * is the precise safety condition. Callers needing more rounds at the
  * same exactness rescale between calls or accept the documented bound.
  */
object PageRank {

  /** @param nodes  one row per node (`idCol`, long-castable); nodes with
    *               no out-edges contribute dangling mass
    * @param edges  directed pair list (`srcCol`, `dstCol`)
    * @param iters  power-iteration rounds
    * @param degLcm a multiple of every out-degree in `edges` (checked)
    * @return (node, pr_num) — scaled integer ranks with the common
    *         denominator `N · (100·N·degLcm)^iters`; ordering and ratios
    *         are exact, bit-identical across partitionings
    */
  def pageRankExact(
      nodes: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, degLcm: Long): DataFrame = {
    require(iters >= 1 && degLcm >= 1, s"bad iters=$iters / degLcm=$degLcm")
    val spark = nodes.sparkSession
    val n = nodes.select(col(idCol)).distinct().count()
    require(n > 0, "empty node set")
    val f = BigInt(100L) * n * degLcm
    require(BigInt(n) * f.pow(iters) <= Long.MaxValue,
      s"N=$n, degLcm=$degLcm, iters=$iters overflows the exact-integer " +
        s"contract (total mass N*F^iters = ${BigInt(n) * f.pow(iters)} > 2^63-1) " +
        "— fewer rounds or a rescaling pass between calls")

    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg")).persist()
    val badDeg = deg.filter(pmod(lit(degLcm), col("deg")) =!= 0).limit(1).collect()
    require(badDeg.isEmpty,
      s"out-degree ${badDeg.headOption.map(_.getLong(1)).getOrElse(-1L)} " +
        s"does not divide degLcm=$degLcm — the per-edge coefficient would " +
        "not be integral, refusing an inexact rank")

    // per-edge integer coefficient 85·N·(degLcm/deg(src))
    val eWithCoef = e.join(deg, Seq("src"))
      .select(col("src"), col("dst"),
        (lit(85L * n) * expr(s"$degLcm div deg")).as("coef"))
      .persist()

    var pr = nodes.select(col(idCol).cast("long").as("node"))
      .distinct().withColumn("p", lit(1L))
      .localCheckpoint(true)
    var m = BigInt(n) // conserved scaled total: N·F^t, closed form
    (1 to iters).foreach { _ =>
      val dangling = pr.join(deg, pr("node") === deg("src"), "left_anti")
        .agg(coalesce(sum(col("p")), lit(0L))).head.getLong(0)
      val baseAdd = 15L * degLcm * m.toLong + 85L * degLcm * dangling
      val contrib = pr.join(eWithCoef, pr("node") === eWithCoef("src"))
        .select(eWithCoef("dst").as("node"), (col("p") * col("coef")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("cs"))
      pr = pr.select(col("node"))
        .join(contrib, Seq("node"), "left")
        .select(col("node"), (coalesce(col("cs"), lit(0L)) + lit(baseAdd)).as("p"))
        .localCheckpoint(true)
      m = m * f
    }
    deg.unpersist()
    eWithCoef.unpersist()
    pr.select(col("node"), col("p").as("pr_num"))
  }

  /** Practical-scale PageRank in QUANTIZED integers — the arm a real
    * 100 TB host graph runs where [[pageRankExact]]'s contract cannot
    * hold (its `N·F^iters ≤ 2⁶³−1` bound and every-degree-divides-degLcm
    * requirement both fail immediately on web-scale degree multisets).
    * Never refuses on degree structure; the price is a PINNED rounding
    * contract (the q107 quantize-to-billionths precedent) instead of
    * exact rationals:
    *
    *   P₀(i)  = 10⁹                        (per-node scale: uniform = 10⁹)
    *   share(j) = P(j) div deg(j)           (floor; values non-negative)
    *   D       = Σ_{dangling j} P(j)
    *   P'(i)   = (15·10⁹) div 100
    *           + (85 · (Σ_{j→i} share(j) + D div N)) div 100
    *
    * Every operation is integer, every `div` lands at a deterministic
    * point of the fold (per-source for shares, once on the scalar for the
    * dangling term, once per node for the damping), and integer sums are
    * order- and partitioning-independent — so the result is bit-identical
    * across cluster layouts and restates as an integer oracle (q195).
    * Truncation leaks < deg_in(i)+2 billionths per node per round —
    * bounded, one-sided (ranks read LOW, never high).
    *
    * Scale shape identical to [[pageRankExact]]: one rank⋈degree join for
    * shares, one rank⋈edges join + groupBy(dst) partial-agg per round,
    * one scalar dangling aggregate, lineage truncated per round. Overflow
    * headroom: a single node's rank is bounded by the (conserved-minus-
    * leak) total ≈ N·10⁹, and the hot expression 85·(cs + D div N) needs
    * 85·N·10⁹ ≤ 2⁶³−1 ⇒ N ≤ 10⁸ nodes at this scale; beyond that,
    * rescale P₀ down (the contract is per-node-scale-relative).
    */
  def pageRankQuant(
      nodes: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, s"bad iters=$iters")
    val n = nodes.select(col(idCol)).distinct().count()
    require(n > 0, "empty node set")
    require(n <= 100000000L,
      s"N=$n exceeds the 10^8 overflow headroom of the 10^9 per-node " +
        "scale (85·N·10^9 must fit BIGINT) — rescale P0 for larger graphs")

    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg")).persist()

    var pr = nodes.select(col(idCol).cast("long").as("node"))
      .distinct().withColumn("p", lit(1000000000L))
      .localCheckpoint(true)
    (1 to iters).foreach { _ =>
      val dangling = pr.join(deg, pr("node") === deg("src"), "left_anti")
        .agg(coalesce(sum(col("p")), lit(0L))).head.getLong(0)
      val dN = dangling / n // scalar floor-div, once per round
      val shares = pr.join(deg, pr("node") === deg("src"))
        .select(col("src"), expr("p div deg").as("share"))
      val contrib = e.join(shares, Seq("src"))
        .groupBy(col("dst")).agg(sum(col("share")).as("cs"))
      pr = pr.select(col("node"))
        .join(contrib, pr("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(150000000L) +
            expr(s"(85 * (coalesce(cs, 0) + $dN)) div 100")).as("p"))
        .localCheckpoint(true)
    }
    deg.unpersist()
    pr.select(col("node"), col("p").as("pr9"))
  }
}
