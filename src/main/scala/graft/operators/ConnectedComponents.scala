package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed connected components by iterative min-label propagation —
  * the canonicalization step that turns near-dup PAIRS into transitive
  * GROUPS (a pair list under-merges chains: a~b, b~c must collapse a,b,c
  * into one group with one surviving representative).
  *
  * Each iteration is one shuffle-join (neighbor labels) plus one
  * aggregation (min per node), both keyed on the node id, so successive
  * iterations reuse the same hash partitioning. Labels decrease
  * monotonically, so the exact-decimal label sum is a convergence
  * certificate: fixpoint iff unchanged. Lineage is truncated with
  * `localCheckpoint` every few rounds (iterative DataFrames otherwise grow
  * an unbounded plan).
  *
  * Scale: rounds = graph diameter. Near-dup graphs are short chains
  * (diameter a handful), so label propagation is the right practical
  * choice; for adversarial long-path graphs the O(log n)-round
  * alternating large-star/small-star algorithm (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC 2014) is the upgrade path —
  * same DataFrame shape, different emit rule.
  */
object ConnectedComponents {

  /** Label every node with the smallest node id reachable from it.
    *
    * @param nodes one row per node (`idCol`, long-castable); nodes absent
    *              from `edges` come out as their own singleton component
    * @param edges undirected pair list (`srcCol`, `dstCol`); direction and
    *              duplicates are irrelevant
    * @return (node, component_id) — component_id = min node id in the
    *         component
    */
  def labelComponents(
      nodes: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 40): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
    val bidir = e.union(e.select(col("v").as("u"), col("u").as("v"))).persist()
    // iterate ONLY over edge-touched nodes: near-dup graphs are sparse, so
    // the per-round state is |paired nodes|, not |corpus| — singletons
    // rejoin once at the end as their own component. At corpus scale this
    // is orders of magnitude less state per round (and the label table
    // usually shrinks under the broadcast threshold, making every round's
    // joins broadcast-local).
    var labels = bidir
      .select(col("u").as("node"))
      .distinct()
      .withColumn("component_id", col("node"))
      .persist()
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val d = df.agg(sum(col("component_id").cast(DecimalType(38, 0)))).head.getDecimal(0)
      if (d == null) java.math.BigDecimal.ZERO else d
    }
    def attachSingletons(converged: DataFrame): DataFrame = nodes
      .select(col(idCol).cast("long").as("node"))
      .join(converged.withColumnRenamed("node", "__n"),
        col("node") === col("__n"), "left")
      .select(col("node"), coalesce(col("component_id"), col("node")).as("component_id"))
    try {
      var prevSum = labelSum(labels)
      var it = 0
      while (it < maxIters) {
        val nbrMin = bidir
          .join(labels, col("v") === col("node"))
          .groupBy(col("u"))
          .agg(min(col("component_id")).as("nbr_lab"))
        var next = labels
          .join(nbrMin, col("node") === col("u"), "left")
          .select(col("node"),
            least(col("component_id"), coalesce(col("nbr_lab"), col("component_id")))
              .as("component_id"))
        if ((it + 1) % 5 == 0) next = next.localCheckpoint(true)
        next = next.persist()
        val s = labelSum(next)
        labels.unpersist(blocking = false)
        labels = next
        it += 1
        if (s.compareTo(prevSum) == 0) return attachSingletons(labels)
        prevSum = s
      }
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds — " +
          "graph diameter exceeds the bound; raise maxIters or switch to " +
          "the large-star/small-star variant")
    } finally bidir.unpersist(blocking = false)
  }
}
