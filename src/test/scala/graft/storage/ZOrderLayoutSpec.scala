package graft.storage

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("interleaveBits: hand-computed Morton codes") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L)).toDF("a", "b")
      .select(ZOrderLayout.interleaveBits($"a", $"b", 4).as("z"))
    // (5,3): a=0101, b=0011 → z bits (b3 a3 b2 a2 b1 a1 b0 a0) = 00011011 = 27
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 27L))
  }

  test("interleaveBitsN: 3-dim hand-computed codes; 2-dim case matches interleaveBits") {
    // (a,b,c)=(5,3,1): a=101, b=011, c=001 → bit layout per level i:
    // (c_i b_i a_i) at positions (3i+2, 3i+1, 3i) → levels: i0=(1,1,1)=7<<0,
    // i1=(0,1,0)=2<<3, i2=(0,0,1)=1<<6 → 7 + 16 + 64 = 87
    val df = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L), (5L, 3L, 1L))
      .toDF("a", "b", "c")
      .select(ZOrderLayout.interleaveBitsN(Seq($"a", $"b", $"c"), 3).as("z"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 4L, 87L))
    // N=2 must reproduce the 2-dim operator exactly (q78's oracle depends on it)
    val pairs = Seq((5L, 3L), (12L, 9L), (1023L, 511L)).toDF("a", "b")
    val both = pairs.select(
      ZOrderLayout.interleaveBits($"a", $"b", 10).as("z2"),
      ZOrderLayout.interleaveBitsN(Seq($"a", $"b"), 10).as("zn"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // result-width guard: 21 dims x 3 bits = 63 > 62 must refuse
    intercept[IllegalArgumentException] {
      ZOrderLayout.interleaveBitsN(Seq.fill(21)($"a"), 3)
    }
  }

  test("normalize: exact edge buckets, wide spans, clamping") {
    val minV = -1000000000000L
    val maxV = 1000000000000L // 2e12 span × 4096 buckets would overflow double precision
    val df = Seq(minV, -1L, 0L, maxV, maxV + 5L).toDF("x")
      .select(ZOrderLayout.normalize($"x", minV, maxV, 12).as("b"))
    val got = df.collect().map(_.getLong(0)).toSeq
    assert(got.head == 0L, got.toString)
    assert(got(1) == 2047L && got(2) == 2048L, s"midpoints must split the bucket range: $got")
    assert(got(3) == 4095L, "max value lands in the top bucket (clamped)")
    assert(got(4) == 4095L, "late out-of-range rows clamp, not crash")
  }

  test("normalizeByQuantiles: balanced buckets under heavy skew; uniform fails") {
    // exponential-ish skew: 4096 values, 90% below 100, tail to 1e6
    val skewed = spark.range(0, 4096)
      .select((pow(lit(10.0), $"id" * 6.0 / 4096).cast("double")).as("v"))
    val bits = 4
    val bounds = ZOrderLayout.quantileBoundaries(skewed, "v", bits)
    val byQuantile = skewed
      .select(ZOrderLayout.normalizeByQuantiles($"v", bounds, bits).as("b"))
      .groupBy($"b").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byQuantile.keySet.size == 16, s"all 16 buckets populated: $byQuantile")
    val ideal = 4096.0 / 16
    byQuantile.values.foreach(c =>
      assert(c < ideal * 2, s"quantile buckets must stay balanced: $byQuantile"))
    val byUniform = skewed
      .select(ZOrderLayout.normalize($"v".cast("long"), 1L, 1000000L, bits).as("b"))
      .groupBy($"b").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byUniform(0L) > 4096 * 0.75,
      s"uniform buckets collapse under skew (the motivation): $byUniform")
    // exact rank semantics: bucket = number of boundaries <= value
    val probe = Seq(bounds.head - 1e-9, bounds.head, bounds.last, bounds.last + 1).toDF("v")
      .select(ZOrderLayout.normalizeByQuantiles($"v", bounds, bits).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(probe == Seq(0L, 1L, 15L, 15L), probe.toString)
  }

  test("writeZOrdered: file assignment is a pure function of the data (portable across sessions)") {
    // the old repartitionByRange path seeded its sampler from the RDD id, so
    // even two writes of the SAME data in the SAME session landed different
    // file boundaries — which made file-level pruning evidence un-oracleable.
    // Non-uniform data (quadratic x, clustered y) so boundary placement
    // actually depends on the distribution, not just the row count.
    val data = spark.range(0, 20000)
      .select(($"id" * $"id" % 4099).as("x"), ($"id" % 37 * 111).as("y"))
    def fileMap(path: String): Set[(Long, Long, Long, Long)] =
      spark.read.parquet(path)
        .groupBy($"__bucket".cast("long").as("b"))
        .agg(count(lit(1)).as("n"), sum($"x" * 4099 + $"y").as("s"), min($"x").as("m"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val p1 = tmp("zdet1_")
    val p2 = tmp("zdet2_")
    ZOrderLayout.writeZOrdered(data, "x", "y", p1, numFiles = 16, bits = 8)
    // second write through a fresh session: no shared driver state may
    // influence assignment
    val s2 = spark.newSession()
    ZOrderLayout.writeZOrdered(
      s2.range(0, 20000).select((col("id") * col("id") % 4099).as("x"),
        (col("id") % 37 * 111).as("y")),
      "x", "y", p2, numFiles = 16, bits = 8)
    val m1 = fileMap(p1)
    assert(m1 == fileMap(p2), "identical data must land identical file assignment")
    assert(m1.size == 16, s"all 16 buckets populated: ${m1.size}")
  }

  test("exactRangeBoundaries: heavy-tie keys stay together, skipped buckets still assign correctly") {
    // one key holding half the rows jumps the cumulative count across
    // several bucket indices; boundary back-fill must keep assignment ==
    // floor(before * numBuckets / total) for every key
    val df = (Seq.fill(500)(50L) ++ (0L until 500L)).toDF("k")
    val bounds = ZOrderLayout.exactRangeBoundaries(df, "k", 8)
    val got = df.select($"k", ZOrderLayout.bucketByBoundaries($"k", bounds).as("b"))
      .distinct().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference model computed directly
    val counts = (Seq.fill(500)(50L) ++ (0L until 500L)).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val total = 1000L
    val sortedKeys = counts.keys.toSeq.sorted
    var before = 0L
    val expect = sortedKeys.map { k =>
      val b = before * 8 / total; before += counts(k); k -> b
    }.toMap
    assert(got == expect, "bucket assignment must equal the exact cumulative model")
    // the heavy key spans buckets 0->4: ties stay in ONE bucket
    assert(got(50L) == expect(50L))
  }

  test("exactRangeBoundaries: distinct-key budget is enforced, not advisory") {
    // the boundary pass sorts DISTINCT keys in one task; a key space wider
    // than the budget (e.g. interleaveBits at bits=24 → 2^48 keys) must be
    // refused with a diagnostic, never silently single-task-sorted
    val df = (0L until 100L).toDF("k")
    val err = intercept[IllegalArgumentException] {
      ZOrderLayout.exactRangeBoundaries(df, "k", 8, maxDistinctKeys = 50L)
    }
    assert(err.getMessage.contains("distinct keys exceed"))
    // at (or under) the budget the same data passes
    val bounds = ZOrderLayout.exactRangeBoundaries(df, "k", 8, maxDistinctKeys = 100L)
    assert(bounds.length == 7)
  }

  test("z-order layout prunes multi-dim box queries; linear layout cannot") {
    // uniform 256×256 grid — each layout writes the same 64 files
    val grid = spark.range(0, 256L * 256)
      .select(($"id" % 256).as("x"), ($"id" / 256).cast("long").as("y"))
    val zPath = tmp("zorder_")
    val linPath = tmp("linear_")
    ZOrderLayout.writeZOrdered(grid, "x", "y", zPath, numFiles = 64, bits = 8)
    grid.repartitionByRange(64, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(linPath)

    // box on the NON-sorted dimension: linear layout reads everything
    val (zY, zTotal) = ZOrderLayout.filesIntersectingBox(
      spark, zPath, "x", "y", 0L, 255L, 100L, 115L)
    val (linY, linTotal) = ZOrderLayout.filesIntersectingBox(
      spark, linPath, "x", "y", 0L, 255L, 100L, 115L)
    assert(zTotal == 64 && linTotal == 64, s"$zTotal / $linTotal")
    assert(linY == 64, "x-sorted files all span the full y range")
    assert(zY <= 24, s"z-order must bound the y-only scan, read $zY/64 files")

    // small box on BOTH dimensions: z-order reads a handful of files
    val (zBox, _) = ZOrderLayout.filesIntersectingBox(
      spark, zPath, "x", "y", 32L, 63L, 32L, 63L)
    assert(zBox <= 8, s"a 1/64-area box must touch few z-ordered files, read $zBox/64")

    // correctness: both layouts return identical box contents
    def boxRows(path: String): Long =
      spark.read.parquet(path)
        .filter($"x".between(32, 63) && $"y".between(32, 63)).count()
    assert(boxRows(zPath) == 32L * 32 && boxRows(linPath) == 32L * 32)
  }
}
