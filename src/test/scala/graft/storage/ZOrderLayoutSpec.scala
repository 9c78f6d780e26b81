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
