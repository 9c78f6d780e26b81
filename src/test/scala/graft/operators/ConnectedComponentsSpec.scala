package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side union-find reference. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to the min representative
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  private def run(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = (0L until n.toLong).toDF("id")
    val e = edges.toDF("src", "dst")
    ConnectedComponents.labelComponents(nodes, "id", e, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def runStar(n: Int, edges: Seq[(Long, Long)], maxIters: Int = 25): Map[Long, Long] = {
    val nodes = (0L until n.toLong).toDF("id")
    val e = edges.toDF("src", "dst")
    ConnectedComponents.labelComponentsStar(nodes, "id", e, "src", "dst", maxIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("seeded random graphs match driver-side union-find") {
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new Random(seed)
      val n = 60
      val edges = Seq.fill(45)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val want = unionFind(n, edges)
      val got = run(n, edges)
      assert(got == want, s"seed=$seed")
    }
  }

  test("a 20-node path collapses to one component (diameter-many rounds)") {
    val edges = (0L until 19L).map(i => (i, i + 1))
    val got = run(20, edges)
    assert(got.values.toSet == Set(0L), got.toString)
  }

  test("path halving: a 64-node path converges within log-bounded rounds") {
    // plain one-hop propagation needs 63 rounds; with the pointer jump the
    // loop must finish inside 14 — maxIters doubles as the assertion
    // (labelComponents throws if it fails to converge in the bound)
    val edges = (0L until 63L).map(i => (i, i + 1))
    val nodes = (0L until 64L).toDF("id")
    val got = ConnectedComponents.labelComponents(
        nodes, "id", edges.toDF("src", "dst"), "src", "dst", maxIters = 14)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(0L), got.toString)
  }

  test("per-round joins broadcast the model-scale label table (no sort-merge)") {
    // The loop localCheckpoints every round, so the returned frame's plan
    // only shows the final attach join — observe the PER-ROUND plans via a
    // QueryExecutionListener over the loop's internal actions instead.
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val edges = (0L until 30L).map(i => (i, i + 1))
      val nodes = (0L until 40L).toDF("id")
      ConnectedComponents.labelComponents(
        nodes, "id", edges.toDF("src", "dst"), "src", "dst").count()
      // listener delivery is asynchronous; poll until the bus QUIESCES
      // (stable count across a full second), not merely until the first
      // event lands — a late per-round plan must not escape the capture
      val deadline = System.nanoTime() + 30_000_000_000L
      var settled = false
      while (!settled && System.nanoTime() < deadline) {
        val before = plans.size
        Thread.sleep(1000)
        settled = plans.size == before && before > 0
      }
      val all = plans.toArray(Array.empty[String])
      val roundPlans = all.filter(_.contains("BroadcastHashJoin"))
      assert(roundPlans.nonEmpty,
        s"no executed plan broadcast the label table (captured ${all.length} plans)")
      val smj = all.filter(_.contains("SortMergeJoin"))
      assert(smj.isEmpty,
        s"per-round label joins fell back to sort-merge:\n${smj.headOption.getOrElse("")}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("no edges: every node is its own singleton component") {
    val got = run(8, Seq.empty)
    assert(got == (0L until 8L).map(i => i -> i).toMap)
  }

  test("isolated nodes coexist with a dense clique") {
    val clique = for (a <- 10L to 14L; b <- (a + 1) to 14L) yield (a, b)
    val got = run(20, clique)
    (10L to 14L).foreach(i => assert(got(i) == 10L))
    ((0L to 9L) ++ (15L to 19L)).foreach(i => assert(got(i) == i))
  }

  test("large-star/small-star matches union-find on seeded random graphs") {
    for (seed <- Seq(3, 11, 99)) {
      val rnd = new Random(seed)
      val n = 60
      val edges = Seq.fill(45)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      assert(runStar(n, edges) == unionFind(n, edges), s"seed=$seed")
    }
  }

  test("large-star/small-star collapses a 64-node path within log-bounded rounds") {
    // label propagation would need 63 rounds; the star variant must finish
    // inside 12 two-step rounds or the O(log) claim is broken
    val edges = (0L until 63L).map(i => (i, i + 1))
    val got = runStar(64, edges, maxIters = 12)
    assert(got.values.toSet == Set(0L), got.filterNot(_._2 == 0L).toString)
  }

  test("large-star/small-star: singletons, cliques, empty edges") {
    assert(runStar(8, Seq.empty) == (0L until 8L).map(i => i -> i).toMap)
    val clique = for (a <- 10L to 14L; b <- (a + 1) to 14L) yield (a, b)
    val got = runStar(20, clique)
    (10L to 14L).foreach(i => assert(got(i) == 10L))
    ((0L to 9L) ++ (15L to 19L)).foreach(i => assert(got(i) == i))
  }

  test("both algorithms agree on a mixed graph") {
    val rnd = new Random(5)
    val edges = Seq.fill(30)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b } ++ (50L until 59L).map(i => (i, i + 1))
    assert(run(60, edges) == runStar(60, edges))
  }

  test("non-convergence guard raises past maxIters") {
    val nodes = (0L until 12L).toDF("id")
    val e = (0L until 11L).map(i => (i, i + 1)).toDF("src", "dst")
    val ex = intercept[IllegalStateException] {
      ConnectedComponents.labelComponents(nodes, "id", e, "src", "dst", maxIters = 3)
    }
    assert(ex.getMessage.contains("did not converge"))
  }
}
