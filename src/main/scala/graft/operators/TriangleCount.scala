package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting with degree-ordered edge orientation —
  * the graph-quality census (triangles + local clustering coefficient)
  * over co-occurrence / link graphs, next to [[ConnectedComponents]] and
  * [[PageRank]] in the graph plane.
  *
  * Algorithm (the "compact-forward" / node-iterator-with-orientation
  * family, Latapy 2008; the same orientation MapReduce triangle counters
  * use): orient every undirected edge from the endpoint with the LOWER
  * (degree, id) rank to the higher. Every triangle then has exactly one
  * wedge (u→v, u→w) at its lowest-rank vertex with a closing oriented
  * edge v→w, so each triangle is counted exactly once, and — the scale
  * property — every vertex's OUT-degree is O(√(2m)): a hot vertex (degree
  * millions at 100 TB) ranks above almost all neighbours and receives
  * almost no out-edges, so the wedge join Σ outdeg² is bounded by
  * O(m^1.5) total and never by hot-vertex degree².
  *
  * Everything is joins + map-side-combined aggregations on node keys:
  * no adjacency list ever materializes on one machine, and the wedge
  * relation streams through the closing-edge join (one shuffle on the
  * (v, w) pair). Triangle counts are orientation-INVARIANT, so any total
  * order verifies the result — the DuckDB oracle replays with plain id
  * ordering and must agree bit-for-bit.
  */
object TriangleCount {

  /** Per-node census over an undirected edge relation. `edges` must have
    * two integral columns `(u, v)`; self-loops and duplicate/reversed
    * pairs are normalized away. Returns one row per node that carries at
    * least one edge: `(node, deg, tri, lcc6)` where `tri` is the number
    * of triangles through the node and `lcc6` the local clustering
    * coefficient in exact integer micros — `2·tri·10⁶ div (deg·(deg−1))`
    * (0 for deg < 2), the truncating-division contract every oracle
    * replays.
    */
  def perNode(edges: DataFrame): DataFrame = {
    val e = edges.toDF("u", "v")
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct()

    val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))

    // (deg, id)-rank orientation: src = lower-ranked endpoint.
    val du = deg.select(col("n").as("u"), col("d").as("du"))
    val dv = deg.select(col("n").as("v"), col("d").as("dv"))
    val oriented = e.join(du, "u").join(dv, "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("dst"))

    // Wedges at the lowest-rank vertex, closed by an oriented edge.
    val o1 = oriented.select(col("src").as("a"), col("dst").as("b"))
    val o2 = oriented.select(col("src").as("a"), col("dst").as("c"))
    val wedges = o1.join(o2, Seq("a")).filter(col("b") =!= col("c"))
      // each unordered wedge {b,c} appears twice in the self-join; keep one
      // and the closing edge in BOTH orientations is checked via canonical
      // (least, greatest) — the closing edge's own orientation depends on
      // ranks we no longer carry.
      .filter(col("b") < col("c"))
      .select(col("a"),
        least(col("b"), col("c")).as("u"), greatest(col("b"), col("c")).as("v"))
    val triangles = wedges.join(e, Seq("u", "v")) // e is canonical (u < v)
      .select(col("a"), col("u").as("b"), col("v").as("c"))

    val tn = triangles.select(col("a").as("n"))
      .unionAll(triangles.select(col("b").as("n")))
      .unionAll(triangles.select(col("c").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("t"))

    deg.join(tn, Seq("n"), "left")
      .select(col("n").as("node"), col("d").cast("long").as("deg"),
        coalesce(col("t"), lit(0L)).cast("long").as("tri"))
      .withColumn("lcc6",
        when(col("deg") >= 2,
          expr("(2 * tri * 1000000) div (deg * (deg - 1))"))
          .otherwise(lit(0L)))
  }

  /** Global census: one row `(n_nodes, n_edges, n_triangles, gcc6)` where
    * `gcc6` is the global clustering coefficient (3·triangles / wedges) in
    * integer micros with the same truncating-division contract.
    */
  def global(edges: DataFrame): DataFrame = {
    val pn = perNode(edges)
    // integer `div`, never floating division: Σdeg / 2 through a double
    // silently loses exactness once the sum passes 2^53, breaking the
    // bit-for-bit oracle contract on large graphs (ADVICE r14)
    pn.agg(
      count(lit(1)).as("n_nodes"),
      expr("sum(deg) div 2").as("n_edges"),
      expr("sum(tri) div 3").as("n_triangles"),
      // Σtri = 3·T and wedges = Σ deg·(deg−1)/2, so gcc = 3T/wedges
      // = 2·Σtri / Σ deg·(deg−1); a wedge-free graph (all degrees ≤ 1)
      // has gcc 0 by convention, never a NULL from 0-division
      when(expr("sum(deg * (deg - 1))") > 0,
        expr("(sum(tri) * 2000000) div sum(deg * (deg - 1))"))
        .otherwise(lit(0L)).as("gcc6"))
  }
}
