package graft.storage

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Z-order (Morton-curve) data layout for multi-dimensional scan pruning —
  * the lakehouse `OPTIMIZE ZORDER BY` shape, Spark-first.
  *
  * A single-column sort prunes scans on that column only: every file spans
  * the full range of every OTHER dimension, so a predicate on dimension 2
  * reads the whole table. Interleaving the bits of both dimensions into one
  * sort key makes each file a LOCAL BOX in (d1, d2) space, so per-file
  * min/max envelopes prune on any queried dimension (Morton 1966; the same
  * layout Delta/Iceberg expose as table optimization).
  *
  * Spark-first construction, no custom expressions:
  *  - one stats pass collects per-dimension min/max (driver scalars);
  *  - each dimension normalizes map-side to a `bits`-wide integer rank
  *    (codegen'd arithmetic);
  *  - the interleave is a `shiftleft`/`bitwise OR` expression TREE — ~6·bits
  *    integer ops that stay inside WholeStageCodegen (functions-not-UDFs);
  *  - `repartitionByRange(zkey)` + `sortWithinPartitions(zkey)` lands one
  *    contiguous curve segment per file.
  *
  * At 100 TB the only full-data cost is the one extra range shuffle at
  * write time; reads repay it on every multi-dimensional scan thereafter
  * (the same trade as the reference's clustered materializations).
  */
object ZOrderLayout {

  /** Interleave the low `bits` of N non-negative int columns: result bit
    * (i·N + j) = column j's bit i — the N-dimensional Morton code (Delta's
    * `ZORDER BY (c1, …, cN)` key). Still a flat shiftleft/AND/OR expression
    * tree, N·bits terms, fully inside WholeStageCodegen.
    */
  def interleaveBitsN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1, "need at least one column to interleave")
    require(bits >= 1 && n * bits <= 62,
      s"$n dims x $bits bits = ${n * bits} result bits — must fit a positive long (<= 62)")
    (for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j))
      .reduce(_ bitwiseOR _)
  }

  /** Interleave the low `bits` of two non-negative int columns:
    * result bit 2i = a bit i, bit 2i+1 = b bit i.
    */
  def interleaveBits(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    interleaveBitsN(Seq(a, b), bits)
  }

  /** Map `c` (long-castable) onto a 0 .. 2^bits-1 integer rank given the
    * dimension's [min, max] — map-side, uniform-width buckets (swap in
    * quantile boundaries for heavily skewed dimensions). The scale+divide
    * runs in Decimal(38,0) (the RangeJoin floor-division lesson): long
    * arithmetic would overflow on wide spans, double division loses
    * exactness past 2^53. Values outside [min, max] (late rows after the
    * stats pass) clamp to the edge buckets.
    */
  def normalize(c: Column, minV: Long, maxV: Long, bits: Int): Column = {
    val spanBig = BigInt(maxV) - BigInt(minV)
    require(spanBig <= BigInt(Long.MaxValue),
      s"dimension span $spanBig exceeds Long range — full-range sentinel values are unsupported")
    val span = math.max(1L, spanBig.toLong)
    val buckets = 1L << bits
    val dec = DecimalType(38, 0)
    val scaled = (c.cast("long").cast(dec) - lit(minV).cast(dec)) * lit(buckets)
    val bucket = ((scaled - pmod(scaled, lit(span).cast(dec))) / lit(span)).cast("long")
    greatest(lit(0L), least(bucket, lit(buckets - 1)))
  }

  /** Quantile-boundary bucket rank for heavily skewed dimensions: uniform
    * width puts most of a skewed column in one bucket (one curve slab =
    * no pruning), so this variant buckets by the dimension's own
    * distribution. Boundaries come from one `approxQuantile` pass
    * (driver-side, model-scale — 2^bits doubles); assignment is a
    * `bits`-step binary search built as a when/element_at expression tree,
    * so it stays codegen'd and map-side like the uniform path.
    */
  def normalizeByQuantiles(c: Column, boundaries: Array[Double], bits: Int): Column = {
    val buckets = 1 << bits
    require(boundaries.length == buckets - 1,
      s"need 2^bits-1 = ${buckets - 1} boundaries, got ${boundaries.length}")
    val b = typedLit(boundaries)
    // classic power-of-two binary search: idx accumulates set bits from the
    // high end; boundaries are 1-indexed for element_at
    var idx: Column = lit(0)
    for (step <- (0 until bits).reverse) {
      val probe = idx + lit(1 << step)
      // element_at is probed CLAMPED (And does not short-circuit; an
      // out-of-range 1-based index would throw under ANSI), while the
      // validity check runs on the unclamped index
      idx = when(probe <= lit(buckets - 1) &&
        c.cast("double") >= element_at(b, least(probe, lit(buckets - 1))), probe)
        .otherwise(idx)
    }
    idx.cast("long")
  }

  /** Quantile boundaries for [[normalizeByQuantiles]]: the (1/2^bits, ...,
    * (2^bits-1)/2^bits) quantiles of `colName`, one approximate pass.
    */
  def quantileBoundaries(df: DataFrame, colName: String, bits: Int,
      relativeError: Double = 0.001): Array[Double] = {
    val buckets = 1 << bits
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    df.stat.approxQuantile(colName, probs, relativeError)
  }

  /** The z-key for two long-castable dimension columns, min/max supplied
    * from a stats pass.
    */
  def zkey(d1: Column, s1: (Long, Long), d2: Column, s2: (Long, Long), bits: Int): Column =
    interleaveBits(
      normalize(d1, s1._1, s1._2, bits),
      normalize(d2, s2._1, s2._2, bits),
      bits)

  /** N-dimensional z-key: each dimension normalized to its `bits`-wide rank
    * (min/max from a stats pass), then Morton-interleaved. The 2-dim [[zkey]]
    * is the N=2 case of this.
    */
  def zkeyN(dims: Seq[(Column, (Long, Long))], bits: Int): Column =
    interleaveBitsN(
      dims.map { case (c, (lo, hi)) => normalize(c, lo, hi, bits) }, bits)

  /** Exact, DETERMINISTIC range-bucket boundaries for a bounded-cardinality
    * long sort key. `repartitionByRange` samples with a seed derived from
    * the RDD id, so PHYSICAL file assignment differs run to run even on
    * identical data — which makes any file-level evidence (pruning counts,
    * envelopes) non-portable across sessions and impossible to oracle.
    * These boundaries are instead a pure function of the data:
    *
    *   before(v) = number of rows with key < v   (exact, from a grouped
    *               count + one cumulative window over DISTINCT keys)
    *   bucket(v) = floor(before(v) * numBuckets / total)
    *   boundary_i = min { v : bucket(v) >= i },  i in 1 .. numBuckets-1
    *
    * so assignment (= number of boundaries <= v) reproduces bucket(v)
    * exactly, ties stay together, and any engine can restate it.
    *
    * Scale note: the cumulative window runs UNPARTITIONED, i.e. a
    * single-partition sort over the DISTINCT keys — which is why this
    * requires a bounded-cardinality key, and why the bound is ENFORCED,
    * not advisory: the distinct-key count is measured (free — the grouped
    * counts frame is already persisted) and anything over
    * `maxDistinctKeys` is refused with an error naming the fix. The
    * default budget is 2^24 = 16.7M keys (~130 MB of longs, the
    * cumulative sort's single task stays comfortable) — exactly the z-key
    * space of the default bits=12; a caller interleaving at bits=24 would
    * otherwise reach this with a silent 2^48-key single-task sort.
    * Callers with an unbounded raw key should quantize first
    * ([[normalize]]).
    * Overflow bound: before * numBuckets must fit a long — total rows
    * <= Long.MaxValue / numBuckets (2.8e17 at 32 files), checked.
    */
  val DefaultMaxDistinctKeys: Long = 1L << 24

  def exactRangeBoundaries(df: DataFrame, key: String, numBuckets: Int,
      maxDistinctKeys: Long = DefaultMaxDistinctKeys): Array[Long] = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(key).cast("long").as("__k"))
      .agg(count(lit(1)).as("__c"))
      .persist()
    try {
      val distinctKeys = counts.count()
      require(distinctKeys <= maxDistinctKeys,
        s"exactRangeBoundaries: $distinctKeys distinct keys exceed the " +
          s"single-task boundary-sort budget of $maxDistinctKeys — quantize " +
          "the key to fewer values (ZOrderLayout.normalize / fewer bits) or " +
          "raise maxDistinctKeys explicitly if the executor can sort that")
      val total = counts.agg(sum(col("__c"))).head.getLong(0)
      require(total <= Long.MaxValue / math.max(1, numBuckets),
        s"row count $total * $numBuckets buckets overflows long bucket arithmetic")
      val w = Window.orderBy(col("__k"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val perBucket = counts
        .withColumn("__before", coalesce(sum(col("__c")).over(w), lit(0L)))
        .withColumn("__bkt", expr(s"(__before * $numBuckets) div $total"))
        .groupBy(col("__bkt")).agg(min(col("__k")).as("__minv"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      // a bucket index can be skipped entirely when one heavy key jumps the
      // cumulative count; its boundary is the first key of the next
      // occupied bucket, so counting boundaries <= v still lands v in
      // bucket(v)
      (1 until numBuckets).flatMap { i =>
        perBucket.find(_._1 >= i).map(_._2)
      }.toArray
    } finally counts.unpersist()
  }

  /** Bucket assignment from [[exactRangeBoundaries]]: the number of
    * boundaries <= v — a flat chain of long compares/adds that stays inside
    * WholeStageCodegen (boundaries are at most numFiles-1 literals).
    */
  def bucketByBoundaries(c: Column, boundaries: Array[Long]): Column =
    if (boundaries.isEmpty) lit(0L)
    else boundaries.map(b => when(c.cast("long") >= lit(b), 1L).otherwise(0L))
      .reduce(_ + _)

  /** Deterministically land `df` sorted by a bounded-cardinality long
    * `sortKey` into (at most) `numFiles` parquet files, one contiguous key
    * range per file: exact boundaries -> map-side bucket assignment ->
    * one hash shuffle on the bucket -> `partitionBy` write (every bucket
    * lives wholly in one task, so each bucket is exactly one file).
    * Identical data => identical file contents, any session, any engine.
    */
  def writeRangeBucketed(
      df: DataFrame, sortKey: Column, path: String, numFiles: Int): Array[Long] = {
    val keyed = df.withColumn("__gk", sortKey.cast("long"))
    val bounds = exactRangeBoundaries(keyed, "__gk", numFiles)
    keyed.withColumn("__bucket", bucketByBoundaries(col("__gk"), bounds))
      .repartition(numFiles, col("__bucket"))
      .sortWithinPartitions(col("__bucket"), col("__gk"))
      .drop("__gk")
      .write.mode("overwrite").partitionBy("__bucket").parquet(path)
    bounds
  }

  /** Write `df` z-ordered by two long-castable columns into `numFiles`
    * parquet files (one curve segment per file, deterministic assignment —
    * see [[writeRangeBucketed]]). Returns the collected (min, max) per
    * dimension from the stats pass.
    */
  def writeZOrdered(
      df: DataFrame, col1: String, col2: String,
      path: String, numFiles: Int, bits: Int = 12): ((Long, Long), (Long, Long)) = {
    val stats = df.agg(
      min(col(col1).cast("long")), max(col(col1).cast("long")),
      min(col(col2).cast("long")), max(col(col2).cast("long"))).head
    val s1 = (stats.getLong(0), stats.getLong(1))
    val s2 = (stats.getLong(2), stats.getLong(3))
    writeRangeBucketed(df, zkey(col(col1), s1, col(col2), s2, bits), path, numFiles)
    (s1, s2)
  }

  /** Per-file (min, max) envelopes of two columns — the skipping metadata a
    * scan planner consults (parquet footers carry the same stats; this
    * reads them engine-natively for evidence and tests).
    */
  def fileEnvelopes(spark: SparkSession, path: String, col1: String, col2: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(
        min(col(col1).cast("long")).as("min1"), max(col(col1).cast("long")).as("max1"),
        min(col(col2).cast("long")).as("min2"), max(col(col2).cast("long")).as("max2"))

  /** Per-file envelopes collected to the driver — file-count-scale metadata
    * (a planner consults footers the same way), so probing many boxes
    * against one layout is driver arithmetic, not repeated full scans.
    */
  final case class Envelope(file: String, min1: Long, max1: Long, min2: Long, max2: Long)

  def collectEnvelopes(
      spark: SparkSession, path: String, col1: String, col2: String): Array[Envelope] =
    fileEnvelopes(spark, path, col1, col2).collect().map(r =>
      Envelope(r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  /** Files whose envelope intersects the box `[lo1,hi1] x [lo2,hi2]`. */
  def boxHits(envs: Array[Envelope],
      lo1: Long, hi1: Long, lo2: Long, hi2: Long): Long =
    envs.count(e =>
      e.max1 >= lo1 && e.min1 <= hi1 && e.max2 >= lo2 && e.min2 <= hi2).toLong

  /** How many files a box predicate `[lo1,hi1] x [lo2,hi2]` must read under
    * the layout at `path` — the pruning evidence number. One-shot
    * convenience; probing several boxes should [[collectEnvelopes]] once.
    */
  def filesIntersectingBox(
      spark: SparkSession, path: String, col1: String, col2: String,
      lo1: Long, hi1: Long, lo2: Long, hi2: Long): (Long, Long) = {
    val envs = collectEnvelopes(spark, path, col1, col2)
    (boxHits(envs, lo1, hi1, lo2, hi2), envs.length.toLong)
  }
}
