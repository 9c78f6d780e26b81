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

  test("non-convergence guard raises past maxIters") {
    val nodes = (0L until 12L).toDF("id")
    val e = (0L until 11L).map(i => (i, i + 1)).toDF("src", "dst")
    val ex = intercept[IllegalStateException] {
      ConnectedComponents.labelComponents(nodes, "id", e, "src", "dst", maxIters = 3)
    }
    assert(ex.getMessage.contains("did not converge"))
  }
}
