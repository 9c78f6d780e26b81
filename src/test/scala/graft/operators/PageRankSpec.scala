package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The exact-integer PageRank: must equal a driver-side BigInt reference
  * on randomized graphs, be bit-identical across partitionings, and
  * refuse (not corrupt) outside its integer contract.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: the same scaled recurrence in BigInt. */
  private def reference(
      nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int,
      degLcm: Long): Map[Long, BigInt] = {
    val n = nodes.size
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var p: Map[Long, BigInt] = nodes.map(_ -> BigInt(1)).toMap
    var m = BigInt(n)
    (1 to iters).foreach { _ =>
      val d = nodes.filterNot(deg.contains).map(p).sum
      val base = BigInt(15) * degLcm * m + BigInt(85) * degLcm * d
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) =>
          BigInt(85) * n * (degLcm / deg(s)) * p(s)
        }.sum
      }
      p = nodes.map(u => u -> (base + in.getOrElse(u, BigInt(0)))).toMap
      m = m * (BigInt(100) * n * degLcm)
    }
    p
  }

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int,
      degLcm: Long, parts: Int = 3): Map[Long, Long] =
    PageRank.pageRankExact(
        nodes.toDF("node").repartition(parts), "node",
        edges.toDF("src", "dst").repartition(parts), "src", "dst",
        iters, degLcm)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("randomized graphs match the BigInt reference exactly") {
    val rnd = new scala.util.Random(4242)
    (1 to 5).foreach { _ =>
      val n = 6 + rnd.nextInt(8)
      val nodes = (0L until n.toLong).toSeq
      // out-degrees drawn from {0, 1, 2, 4} so degLcm = 4 covers them
      val edges = nodes.flatMap { u =>
        val d = Seq(0, 1, 2, 4)(rnd.nextInt(4))
        rnd.shuffle(nodes.filterNot(_ == u)).take(d).map(u -> _)
      }
      val got = run(nodes, edges, iters = 2, degLcm = 4)
      val want = reference(nodes, edges, 2, 4)
      assert(got == want.map { case (k, v) => k -> v.toLong },
        s"n=$n edges=$edges")
    }
  }

  test("bit-identical across partitionings; mass conserved; dangling handled") {
    val nodes = (0L to 7L).toSeq
    // one q148-shaped group: 1..3 -> 0 (leader), every i -> 100.. no:
    // leader 0 -> ext 4; members 1..3 -> 0 and -> their ext 5..7
    val edges = Seq(0L -> 4L) ++ (1L to 3L).flatMap(i => Seq(i -> 0L, i -> (i + 4L)))
    val a = run(nodes, edges, iters = 3, degLcm = 2, parts = 1)
    val b = run(nodes, edges, iters = 3, degLcm = 2, parts = 7)
    assert(a == b, "partitioning must not change a single bit")
    // conserved total = N * F^iters with F = 100*N*degLcm
    val f = BigInt(100) * 8 * 2
    assert(a.values.map(BigInt(_)).sum == BigInt(8) * f.pow(3))
    // members have no in-links: all base-mass, equal; leader strictly above
    assert(a(1L) == a(2L) && a(2L) == a(3L))
    assert(a(0L) > a(1L), "the leader collects three in-links")
    // each member's ext site inherits exactly its owner's contribution
    assert(a(5L) == a(6L) && a(6L) == a(7L) && a(5L) > a(1L))
  }

  /** Driver-side reference for the QUANT arm: the pinned truncating fold. */
  private def quantReference(
      nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val n = nodes.size
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var p: Map[Long, Long] = nodes.map(_ -> 1000000000L).toMap
    (1 to iters).foreach { _ =>
      val dN = nodes.filterNot(deg.contains).map(p).sum / n
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => p(s) / deg(s) }.sum
      }
      p = nodes.map(u =>
        u -> (150000000L + 85L * (in.getOrElse(u, 0L) + dN) / 100L)).toMap
    }
    p
  }

  private def runQuant(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int,
      parts: Int = 3): Map[Long, Long] =
    PageRank.pageRankQuant(
        nodes.toDF("node").repartition(parts), "node",
        edges.toDF("src", "dst").repartition(parts), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("quant arm: matches the truncating-fold reference on degrees the exact arm refuses") {
    val rnd = new scala.util.Random(77)
    (1 to 4).foreach { _ =>
      val n = 6 + rnd.nextInt(8)
      val nodes = (0L until n.toLong).toSeq
      // degrees 0..5 freely — 3 and 5 don't divide any small degLcm
      val edges = nodes.flatMap { u =>
        rnd.shuffle(nodes.filterNot(_ == u)).take(rnd.nextInt(6)).map(u -> _)
      }
      assert(runQuant(nodes, edges, iters = 3) == quantReference(nodes, edges, 3),
        s"n=$n edges=$edges")
    }
  }

  test("quant arm: bit-identical across partitionings, tracks the exact arm within truncation") {
    val nodes = (0L to 7L).toSeq
    val edges = Seq(0L -> 4L) ++ (1L to 3L).flatMap(i => Seq(i -> 0L, i -> (i + 4L)))
    val a = runQuant(nodes, edges, iters = 3, parts = 1)
    val b = runQuant(nodes, edges, iters = 3, parts = 7)
    assert(a == b, "partitioning must not change a single bit")
    // agreement with the exact arm: quant(i) ≈ 1e9 · pr_num(i) / F^iters
    // (both start uniform at per-node scale 1); truncation is one-sided
    // and bounded by ~(deg_in+2) units/round — allow 50 billionths
    val exact = run(nodes, edges, iters = 3, degLcm = 2, parts = 3)
    val f = BigInt(100) * 8 * 2
    nodes.foreach { u =>
      val want = (BigInt(exact(u)) * 1000000000L / f.pow(3)).toLong
      assert(math.abs(a(u) - want) <= 50, s"node $u: quant ${a(u)} vs exact≈$want")
    }
  }

  test("refusals: overflow bound and non-dividing out-degree") {
    val nodes = (0L to 7L).toSeq
    val edges = Seq(0L -> 1L)
    val e1 = intercept[IllegalArgumentException](
      run(nodes, edges, iters = 9, degLcm = 2))
    assert(e1.getMessage.contains("overflows"))
    val tri = Seq(0L -> 1L, 0L -> 2L, 0L -> 3L) // out-degree 3
    val e2 = intercept[IllegalArgumentException](
      run(nodes, tri, iters = 1, degLcm = 2))
    assert(e2.getMessage.contains("does not divide"))
  }
}
