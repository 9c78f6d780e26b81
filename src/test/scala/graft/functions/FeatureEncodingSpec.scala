package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FeatureEncodingSpec extends SparkSpec {
  import spark.implicits._

  test("out-of-fold encoding matches a driver-side reference; own fold excluded") {
    val df = (0L until 500L).map(i => (i, s"c${i % 7}", (i * 13 % 101))).toDF("id", "cat", "t")
    val alpha = 10L
    val got = FeatureEncoding.targetEncodeOof(df, "id", "cat", col("t"),
      nFolds = 4, alpha = alpha)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap

    // reference fold: same xxhash64 folds read back from the engine
    val folds = df.select(col("id"), col("cat"), col("t"),
        pmod(xxhash64(col("id").cast("string")), lit(4L)).as("fold"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val gsum = folds.map(_._3).sum; val gcnt = folds.length.toLong
    val prior = gsum / gcnt
    folds.groupBy(r => (r._2, r._4)).foreach { case ((cat, fold), rows) =>
      val catRows = folds.filter(_._2 == cat)
      val oofRows = catRows.filter(_._4 != fold)
      val oofSum = oofRows.map(_._3).sum
      val oofCnt = oofRows.length.toLong
      val enc = (oofSum + alpha * prior) / (oofCnt + alpha)
      val g = got((cat, fold))
      assert(g == ((rows.length.toLong, rows.map(_._3).sum, oofCnt, oofSum, enc)),
        s"($cat,$fold): got $g")
      // leakage check: the fold's own mass is NOT in the encoding inputs
      assert(g._3 == catRows.length - rows.length)
    }
  }

  test("a category confined to one fold falls back toward the prior, never divides by zero") {
    val df = (Seq((1L, "only", 1000000L)) ++
      (2L until 200L).map(i => (i, "common", 10L))).toDF("id", "cat", "t")
    val out = FeatureEncoding.targetEncodeOof(df, "id", "cat", col("t"),
      nFolds = 4, alpha = 5L).filter(col("category") === "only").collect()
    // the 'only' category appears in exactly one fold; that row's encoding
    // has oof_cnt 0 and must equal the prior exactly
    val own = out.filter(_.getAs[Long]("oof_cnt") == 0L)
    assert(own.length == 1)
    val gsum = 1000000L + (2L until 200L).map(_ => 10L).sum
    val prior = gsum / 199L
    assert(own.head.getAs[Long]("enc") == prior)
  }

  test("quantileBins: equal-frequency by value, ties share a bin, exact counts") {
    val df = ((0L until 1000L).map(i => i % 97) ++ Seq.fill(200)(42L))
      .map(v => Tuple1(v)).toSeq.toDF("x")
    val bins = FeatureEncoding.quantileBins(df, col("x"), nBins = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val n = 1200L
    // reference: rows_below by value order, bin = rows_below*4/n
    val ref = ((0L until 1000L).map(_ % 97) ++ Seq.fill(200)(42L))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var below = 0L
    ref.keys.toSeq.sorted.foreach { v =>
      val (cnt, rb, bin) = bins(v)
      assert(cnt == ref(v) && rb == below && bin == below * 4 / n, s"value $v")
      below += ref(v)
    }
    // every occurrence of a value lands in ONE bin (no NTILE tie split),
    // and bins are contiguous in value order
    val byBin = bins.toSeq.groupBy(_._2._3)
    assert(byBin.keySet.subsetOf((0L until 4L).toSet))
    val binRanges = byBin.view.mapValues(vs => (vs.map(_._1).min, vs.map(_._1).max))
    binRanges.toSeq.sortBy(_._1).sliding(2).foreach {
      case Seq((_, (_, hi)), (_, (lo, _))) => assert(hi < lo, "bins overlap")
      case _ =>
    }
    // NULLs excluded
    val withNull = df.withColumn("x", when(col("x") === 5L, lit(null)).otherwise(col("x")))
    assert(FeatureEncoding.quantileBins(withNull, col("x"), 4)
      .filter(col("v").isNull).count() == 0L)
    // cardinality budget refuses
    intercept[IllegalArgumentException] {
      FeatureEncoding.quantileBins(df, col("x"), 4, maxDistinctValues = 10L)
    }
  }

  test("encoding table is invariant under repartitioning") {
    val df = (0L until 300L).map(i => (i, s"c${i % 5}", i % 50)).toDF("id", "cat", "t")
    def run(d: org.apache.spark.sql.DataFrame) =
      FeatureEncoding.targetEncodeOof(d, "id", "cat", col("t"), 3, 7L)
        .collect().map(_.toSeq).toSet
    assert(run(df.repartition(17)) == run(df.coalesce(1)))
  }

  test("feature hashing: idx/sign are pure functions of the feature string; NULLs drop") {
    val df = Seq(("a", "x"), ("a", null), ("b", "x")).toDF("c1", "c2")
    val out = FeatureEncoding.hashFeatures(df,
      Seq(concat(lit("c1="), col("c1")), concat(lit("c2="), col("c2"))), 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 5) // 6 slots - 1 null
    // same feature string → same (idx, sign) everywhere
    assert(out.groupBy(_._1).forall(_._2.distinct.length == 1))
    out.foreach { case (f, idx, sign) =>
      assert(idx >= 0 && idx < 64 && (sign == 1L || sign == -1L), s"$f -> ($idx,$sign)")
      val h = df.sparkSession.sql(
        s"SELECT pmod(xxhash64('$f'), 64L), 1 - 2*pmod(xxhash64('$f#s'), 2L)").head
      assert(idx == h.getLong(0) && sign == h.getLong(1))
    }
  }

  test("exactPercentiles: nearest-rank against a driver reference; ties and edges exact") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(800)((if (rnd.nextBoolean()) "a" else "b",
      rnd.nextInt(40).toLong)) // heavy ties
    val df = rows.toDF("g", "v")
    val got = FeatureEncoding.exactPercentiles(df, col("v"), Seq("g"),
      Seq(1, 500, 900, 1000))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val sorted = rs.map(_._2).sorted
      for (q <- Seq(1, 500, 900, 1000)) {
        val target = (q.toLong * sorted.size + 999) / 1000
        val want = sorted((target - 1).toInt)
        assert(got((g, q.toLong)) == want, s"($g,$q): got ${got((g, q.toLong))} want $want")
      }
    }
    // permille 1000 = max, permille 1 = min (n < 1000 ⇒ target 1)
    assert(got(("a", 1000L)) == rows.filter(_._1 == "a").map(_._2).max)
    assert(got(("a", 1L)) == rows.filter(_._1 == "a").map(_._2).min)
  }

  test("feature hashing: signed collisions cancel in expectation; non-power-of-two refuses") {
    // 2000 distinct features into 16 slots: heavy collisions, but the
    // signed per-slot sums stay near zero (mean |sum| ≈ √(n/dims) ≈ 11)
    val df = (0L until 2000L).map(i => Tuple1(s"f$i")).toDF("f")
    val sums = FeatureEncoding.hashFeatures(df, Seq(col("f")), 16)
      .groupBy(col("idx")).agg(sum(col("sign")).as("s"))
      .collect().map(_.getAs[Long]("s"))
    assert(sums.forall(s => math.abs(s) < 60), s"signed sums off: ${sums.toSeq}")
    intercept[IllegalArgumentException](
      FeatureEncoding.hashFeatures(df, Seq(col("f")), 60))
  }
}
