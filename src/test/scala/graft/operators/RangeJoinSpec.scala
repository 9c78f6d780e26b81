package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bucketed interval join must be EXACTLY the non-equi join — every
  * qualifying pair once, no bucket-boundary duplicates or gaps — and must
  * plan as an equi-join on the bucket id, not a nested-loop product.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // intervals deliberately straddle bucket boundaries and overlap each other
  private lazy val intervals = Seq(
    (1L, 0L, 25L),    // covers buckets 0-2 at width 10
    (2L, 10L, 20L),   // exactly one bucket
    (3L, 18L, 42L),   // straddles 1-4, overlaps 1 and 2
    (4L, 95L, 105L)   // far interval
  ).toDF("iv_id", "ws", "we")

  private lazy val probe =
    Seq(0L, 9L, 10L, 19L, 20L, 24L, 25L, 41L, 42L, 99L, 200L).toDF("ts")

  private def naive(how: String) =
    probe.as("p").join(intervals.as("i"),
      $"ts" >= $"ws" && $"ts" < $"we", how)

  test("inner: identical to the naive non-equi join for every bucket width") {
    val expected = naive("inner")
      .select("ts", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    for (b <- Seq(1L, 3L, 10L, 64L)) {
      val got = RangeJoin.intervalJoin(probe, "ts", intervals, "ws", "we", b)
        .select("ts", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.sameElements(expected), s"bucket width $b diverged")
    }
  }

  test("left: probe rows with no interval survive with nulls") {
    val got = RangeJoin.intervalJoin(probe, "ts", intervals, "ws", "we", 10L, how = "left")
    // 42 (end-exclusive on interval 3) and 200 match nothing; 25 is outside
    // [0,25) but inside [18,42)
    val unmatched = got.filter($"iv_id".isNull).select("ts")
      .collect().map(_.getLong(0)).sorted
    assert(unmatched.sameElements(Array(42L, 200L)), unmatched.mkString(","))
    // matched pairs equal the naive left join's matched pairs
    val expected = naive("left").filter($"iv_id".isNotNull)
      .select("ts", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val matched = got.filter($"iv_id".isNotNull)
      .select("ts", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(matched.sameElements(expected))
  }

  test("exact bucketing beyond 2^53 and near Long.MinValue (no double rounding, no underflow)") {
    // 2^53 + k is where double loses integer precision; Long.MinValue + k is
    // where the pre-fix long subtraction in floorDiv underflowed. Both must
    // bucket exactly: compare against the naive non-equi join.
    val big = 1L << 53
    val lo = Long.MinValue
    val iv = Seq(
      (1L, big + 3, big + 20),          // straddles the 2^53 precision cliff
      (2L, lo, lo + 25),                // "-infinity" sentinel start
      (3L, -big - 20, -big - 3)         // negative beyond-2^53
    ).toDF("iv_id", "ws", "we")
    val pb = Seq(big + 2, big + 3, big + 19, big + 20, lo, lo + 7, lo + 24,
      lo + 25, -big - 21, -big - 20, -big - 4, -big - 3).toDF("ts")
    val expected = pb.as("p").join(iv.as("i"), $"ts" >= $"ws" && $"ts" < $"we")
      .select("ts", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(expected.length == 7, s"fixture sanity: ${expected.mkString(",")}")
    for (b <- Seq(7L, 10L)) {
      val got = RangeJoin.intervalJoin(pb, "ts", iv, "ws", "we", b)
        .select("ts", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.sameElements(expected), s"bucket width $b diverged: ${got.mkString(",")}")
    }
  }

  test("degenerate intervals (end <= start) match nothing and register no buckets") {
    val iv = Seq((1L, 10L, 10L), (2L, 20L, 5L), (3L, 0L, 15L)).toDF("iv_id", "ws", "we")
    val got = RangeJoin.intervalJoin(probe, "ts", iv, "ws", "we", 10L)
      .select("ts", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.forall(_._2 == 3L), s"degenerate interval matched: ${got.mkString(",")}")
    assert(got.map(_._1).sameElements(Array(0L, 9L, 10L)), got.mkString(","))
  }

  test("over-wide interval fails fast with a readable error, not a sequence() explosion") {
    val iv = Seq((1L, 0L, Long.MaxValue / 2)).toDF("iv_id", "ws", "we")
    val ex = intercept[Exception] {
      RangeJoin.intervalJoin(probe, "ts", iv, "ws", "we", 10L,
        maxBucketsPerInterval = 1000L).collect()
    }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("spans more than 1000 buckets"), s"wrong error: $ex")
  }

  test("full-long-range sentinel interval hits the span guard (no long overflow bypass)") {
    // bucket width 1, bounds at ±infinity sentinels: hi - lo overflows
    // LongType; the decimal span guard must still raise the readable error
    val iv = Seq((1L, Long.MinValue, Long.MaxValue)).toDF("iv_id", "ws", "we")
    val ex = intercept[Exception] {
      RangeJoin.intervalJoin(probe, "ts", iv, "ws", "we", 1L,
        maxBucketsPerInterval = 1000L).collect()
    }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("spans more than 1000 buckets"), s"wrong error: $ex")
  }

  test("randomized corpora: bucketed join == naive non-equi join for random widths") {
    val rnd = new scala.util.Random(424242L)
    for (trial <- 1 to 5) {
      val iv = Seq.fill(1 + rnd.nextInt(30)) {
        val a = rnd.nextInt(200) - 100L
        val b = rnd.nextInt(200) - 100L
        (rnd.nextLong(), a, b) // includes degenerate end <= start pairs
      }.toDF("iv_id", "ws", "we")
      val pb = Seq.fill(1 + rnd.nextInt(40))(rnd.nextInt(240) - 120L).toDF("ts")
      val expected = pb.as("p").join(iv.as("i"), $"ts" >= $"ws" && $"ts" < $"we")
        .select("ts", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      for (b <- Seq(1L, 2L, 7L, 31L)) {
        val got = RangeJoin.intervalJoin(pb, "ts", iv, "ws", "we", b)
          .select("ts", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
        assert(got.sameElements(expected),
          s"trial $trial width $b: ${got.length} pairs vs expected ${expected.length}")
      }
      // left join: same matched pairs, every probe row survives
      val left = RangeJoin.intervalJoin(pb, "ts", iv, "ws", "we", 7L, how = "left")
      assert(left.select("ts").distinct().count() == pb.distinct().count(),
        s"trial $trial: left join lost probe rows")
    }
  }

  test("plans as an equi-join on the bucket id, not a nested-loop product") {
    val plan = RangeJoin.intervalJoin(probe, "ts", intervals, "ws", "we", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join degenerated to a product:\n$plan")
  }
}
