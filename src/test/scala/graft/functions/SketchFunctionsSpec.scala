package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchFunctionsSpec extends SparkSpec {
  import spark.implicits._

  /** Skewed synthetic stream: item "w<i>" appears with frequency
    * proportional to 1/i (zipf-ish), shuffled deterministically so heavy
    * items are interleaved with the tail.
    */
  private def zipfStream(distinct: Int, scale: Int): Seq[String] = {
    val items = (1 to distinct).flatMap(i => Seq.fill(scale / i)(s"w$i"))
    // deterministic shuffle: sort by md5 of (item, position)
    items.zipWithIndex
      .sortBy { case (s, i) =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"$s#$i".getBytes("UTF-8")).toSeq.toString
      }
      .map(_._1)
  }

  private def sketchEntries(items: Seq[String], capacity: Int, parts: Int): Map[String, Long] = {
    val df = items.toDF("item").repartition(parts)
    val arr = df.agg(SketchFunctions.heavyHittersSketch($"item", capacity).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item", $"e.est_count")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val m = arr.toMap
    assert(m.size == arr.length, "sketch emitted a duplicate item")
    m
  }

  test("MG sketch is exact when capacity >= distinct count") {
    val items = zipfStream(distinct = 8, scale = 64)
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 7)) {
      val est = sketchEntries(items, capacity = 16, parts = parts)
      assert(est == exact, s"parts=$parts: $est != $exact")
    }
  }

  test("MG guarantee: est <= true <= est + N/(cap+1); no heavy item missing") {
    val items = zipfStream(distinct = 40, scale = 300)
    val n = items.size.toLong
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 5, 16)) {
      val capacity = 6
      val bound = n / (capacity + 1)
      val est = sketchEntries(items, capacity, parts)
      assert(est.size <= capacity)
      est.foreach { case (item, e) =>
        val t = exact(item)
        assert(e <= t, s"parts=$parts: overcount $item est=$e true=$t")
        assert(t - e <= bound, s"parts=$parts: undercount beyond bound for $item")
      }
      // completeness: anything above the bound MUST be in the summary
      exact.filter(_._2 > bound).keys.foreach { item =>
        assert(est.contains(item), s"parts=$parts: heavy item $item missing (true=${exact(item)}, bound=$bound)")
      }
    }
  }

  test("two-pass exactHeavyHitters: exact answer, invariant to partitioning") {
    val items = zipfStream(distinct = 40, scale = 300)
      .zipWithIndex.map { case (s, i) => (if (i % 2 == 0) "g1" else "g2", s) }
    val df = items.toDF("grp", "item")
    val expected = items.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((g, it), c) => (g, it, c) }
    def run(parts: Int): Set[(String, String, Long, Long)] =
      SketchFunctions.exactHeavyHitters(
          df.repartition(parts), Seq("grp"), "item", capacity = 8, denom = 9)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
    val totals = items.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val want = expected
      .filter { case (g, _, c) => c * 9 > totals(g) }
      .map { case (g, it, c) => (g, it, c, totals(g)) }
      .toSet
    assert(want.nonEmpty, "fixture must produce at least one heavy hitter")
    val r1 = run(1)
    val r13 = run(13)
    assert(r1 == want, s"parts=1: $r1 != $want")
    assert(r13 == want, "exact output must not depend on partitioning")
  }

  test("two-pass plan: map-side partial sketch, broadcast candidates") {
    val items = zipfStream(distinct = 20, scale = 100).toDF("item")
      .withColumn("grp", lit("g"))
    val out = SketchFunctions.exactHeavyHitters(
      items, Seq("grp"), "item", capacity = 16, denom = 9)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("partial_heavy_hitters"),
      s"sketch pass must partial-aggregate map-side:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"candidates must broadcast back to the item stream:\n$plan")
  }

  test("exactHeavyHitters refuses a threshold below the MG guarantee") {
    val df = Seq("a", "b").toDF("item")
    val e = intercept[IllegalArgumentException] {
      SketchFunctions.exactHeavyHitters(df, Seq.empty, "item", capacity = 8, denom = 10)
    }
    assert(e.getMessage.contains("capacity+1"))
  }

  test("nulls are skipped; empty input yields an empty summary") {
    val df = Seq(Some("x"), None, Some("x"), None).toDF("item")
    val arr = df.agg(SketchFunctions.heavyHittersSketch($"item", 4).as("hh"))
      .head.getSeq[Row](0)
    assert(arr.map(r => (r.getString(0), r.getLong(1))) == Seq(("x", 2L)))
    val empty = spark.emptyDataset[String].toDF("item")
    val arr2 = empty.agg(SketchFunctions.heavyHittersSketch($"item", 4).as("hh"))
      .head.getSeq[Row](0)
    assert(arr2.isEmpty)
  }

  test("bloom: no false negatives; bytes identical across partitionings; FPP sane") {
    val inserted = (0 until 500).map(i => s"key$i")
    val others = (0 until 2000).map(i => s"absent$i")
    def build(parts: Int): Array[Byte] =
      inserted.toDF("item").repartition(parts)
        .agg(SketchFunctions.bloomAgg($"item", numBits = 1L << 14, numHashes = 5))
        .head.getAs[Array[Byte]](0)
    val b1 = build(1)
    val b8 = build(8)
    assert(java.util.Arrays.equals(b1, b8),
      "bloom bytes must be partitioning-invariant (merge is OR)")
    val probes = (inserted.map((_, true)) ++ others.map((_, false))).toDF("item", "inserted")
    val got = probes
      .select($"item", $"inserted",
        SketchFunctions.bloomMightContain(lit(b1), $"item").as("hit"))
      .collect()
    got.filter(_.getBoolean(1)).foreach(r =>
      assert(r.getBoolean(2), s"false negative: ${r.getString(0)}"))
    val fp = got.filter(r => !r.getBoolean(1) && r.getBoolean(2)).length
    // theoretical FPP for n=500, m=2^14, k=5 is ~0.2%; allow generous slack
    assert(fp <= 40, s"false-positive rate implausibly high: $fp/2000")
  }

  test("bloom-prefiltered contamination equals the exact broadcast-join version") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val train = docs.filter($"doc_id" % 50 =!= 0)
    val eval_ = docs.filter($"doc_id" % 50 === 0)
    val exact = DedupFunctions.contaminationNgramOverlap(
        train, "doc_id", "text", eval_, "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaBloom = DedupFunctions.contaminationViaBloom(
        train, "doc_id", "text", eval_, "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty, "fixture must contain contaminated docs")
    assert(viaBloom == exact)
  }

  test("SQL surface: bloom_agg / bloom_might_contain registered") {
    GraftFunctions.register(spark)
    Seq("a", "b", "c").toDF("item").createOrReplaceTempView("bloom_in")
    val hits = spark.sql(
      """SELECT might FROM (
        |  SELECT bloom_might_contain((SELECT bloom_agg(item, 4096, 4) FROM bloom_in), x) AS might
        |  FROM VALUES ('a'), ('zzz') AS t(x))""".stripMargin)
      .collect().map(_.getBoolean(0)).toSeq
    assert(hits.head, "inserted key must hit")
  }

  test("sketch state survives serialization with unicode, empty, and long items") {
    val items = Seq("", "héllo wörld", "日本語テキスト", "emoji 🎉🌍", "a" * 10000,
      "", "héllo wörld", "日本語テキスト")
    val est = sketchEntries(items, capacity = 16, parts = 5) // partial agg forces ser/de
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(est == exact, s"$est != $exact")
    val bloom = items.toDF("item").repartition(5)
      .agg(SketchFunctions.bloomAgg($"item", 4096, 4)).head.getAs[Array[Byte]](0)
    items.distinct.foreach { s =>
      val hit = Seq(s).toDF("item")
        .select(SketchFunctions.bloomMightContain(lit(bloom), $"item"))
        .head.getBoolean(0)
      assert(hit, s"bloom false negative for ${s.take(20)}")
    }
  }

  test("SQL surface: heavy_hitters registered and group-aggregates") {
    GraftFunctions.register(spark)
    zipfStream(distinct = 8, scale = 64).toDF("item").createOrReplaceTempView("hh_in")
    val rows = spark.sql(
      "SELECT e.item, e.est_count FROM (SELECT explode(heavy_hitters(item, 16)) e FROM hh_in)")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("w1") == 64L && rows.size == 8)
  }

  test("hll bucket/rho match a JVM bit reference of the same xxhash64") {
    val df = (0L until 2000L).toDF("v")
    val got = df.select(col("v"),
        SketchFunctions.hllRho(col("v"), 8)._1.as("bucket"),
        SketchFunctions.hllRho(col("v"), 8)._2.as("rho"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val hashes = df.select(col("v"), xxhash64(col("v").cast("string")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (v, bucket, rho) =>
      val h = hashes(v)
      assert(bucket == (h >>> 56), s"v=$v bucket")
      val w = h & ((1L << 56) - 1)
      val expRho = if (w == 0) 57L else 56 - (63 - java.lang.Long.numberOfLeadingZeros(w))
      assert(rho == expRho, s"v=$v rho: got $rho want $expRho (w=$w)")
    }
  }

  test("hll merge law: disjoint-half sketches max-merge to the whole-stream sketch") {
    val rnd = new scala.util.Random(11)
    val vals = Seq.fill(5000)(rnd.nextLong())
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val whole = SketchFunctions.hllBuckets(df.repartition(7), col("v"), 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val halves = SketchFunctions.hllBuckets(
        df.withColumn("half", col("id") % 2), col("v"), 8, Seq("half"))
      .collect().groupBy(_.getLong(1)) // by bucket
      .map { case (b, rows) => b -> rows.map(_.getLong(2)).max }
    assert(halves == whole)
  }

  test("hll estimate: within 5 standard errors on 20k random values; empty input exact") {
    val rnd = new scala.util.Random(3)
    val n = 20000
    val df = Seq.fill(n)(rnd.nextLong()).distinct.toDF("v")
    val exact = df.count()
    val est6 = SketchFunctions.hllEstimate(
      SketchFunctions.hllBuckets(df, col("v"), 8), 8, 718273L)
      .head.getAs[Long]("est6")
    val rel = math.abs(est6 / 1e6 - exact) / exact
    assert(rel < 5 * 1.04 / 16, s"relative error $rel") // σ = 1.04/√256
    // all-empty register table: T = 256·2^57 exactly, nb = 0
    val empty = SketchFunctions.hllEstimate(
      SketchFunctions.hllBuckets(df.filter(lit(false)), col("v"), 8), 8, 718273L).head
    assert(empty.getAs[Long]("n_zero") == 256L)
    assert(empty.getAs[String]("t_str") == (BigInt(256) * (BigInt(1) << 57)).toString)
  }

  test("kmv ranks = the k smallest hashes in UNSIGNED order, dupes collapsed") {
    val df = (0L until 500L).map(v => (v % 250, "g")).toDF("v", "g") // every value twice
    val got = SketchFunctions.kmvMins(df, col("v"), 20, Seq("g"))
      .orderBy(col("rk")).collect().map(_.getAs[Long]("uc"))
    val ref = (0L until 250L)
      .map(v => df.sparkSession.sql(s"SELECT xxhash64(cast($v as string))").head.getLong(0))
      .map(h => h ^ Long.MinValue).sorted.take(20)
    assert(got.toSeq == ref)
    assert(got.length == 20)
  }

  test("kmv theta set-op estimates land near exact counts on planted overlap") {
    // A = [0, 4000), B = [2000, 6000): |A∩B| = 2000, |A∪B| = 6000
    val rows = (0L until 4000L).map(v => ("a", v)) ++
      (2000L until 6000L).map(v => ("b", v))
    val dv = rows.toDF("st", "v")
    val k = 256
    val sk = SketchFunctions.kmvMins(dv, col("v"), k, Seq("st"))
    val thetaC = sk.filter(col("rk") === k).agg(min(col("uc"))).head.getLong(0)
    val below = sk.filter(col("uc") < thetaC)
      .select(col("st"), col("uc")).collect()
    val aSet = below.filter(_.getString(0) == "a").map(_.getLong(1)).toSet
    val bSet = below.filter(_.getString(0) == "b").map(_.getLong(1)).toSet
    val theta = BigInt(thetaC) + (BigInt(1) << 63)
    def est(cnt: Int): Double =
      (BigInt(cnt) * (BigInt(1) << 64) / theta).toDouble
    // ~3σ tolerance at k=256 (σ ≈ 1/√k ≈ 6.3%)
    assert(math.abs(est((aSet & bSet).size) - 2000) < 2000 * 0.35,
      s"inter est ${est((aSet & bSet).size)}")
    assert(math.abs(est((aSet | bSet).size) - 6000) < 6000 * 0.20,
      s"union est ${est((aSet | bSet).size)}")
  }

  test("kmvSetOps: below-k sketches degrade to EXACT mode (θ = 2^64), never NULL") {
    // both sets far below k=128: θ must read 2^64 and the estimates must
    // equal the exact counts × 10⁶ (ADVICE r14 — previously NULL / borrowed θ)
    val rows = (0L until 40L).map(v => ("a", v)) ++ (20L until 70L).map(v => ("b", v))
    val r = SketchFunctions.kmvSetOps(rows.toDF("st", "v"),
      col("st"), col("v"), "a", "b", k = 128).head()
    assert(r.getAs[String]("theta_str") == "18446744073709551616")
    assert(r.getAs[Long]("n_inter") == 20L && r.getAs[Long]("n_union") == 70L)
    assert(r.getAs[Long]("n_common_lt") == 20L && r.getAs[Long]("n_union_lt") == 70L)
    assert(r.getAs[Long]("est_inter6") == 20L * 1000000L)
    assert(r.getAs[Long]("est_union6") == 70L * 1000000L)
    // mixed: A holds ≥ k values, B below k — θ is A's rank-k (not 2^64),
    // and the estimators stay non-NULL
    val rows2 = (0L until 4000L).map(v => ("a", v)) ++ (0L until 50L).map(v => ("b", v))
    val r2 = SketchFunctions.kmvSetOps(rows2.toDF("st", "v"),
      col("st"), col("v"), "a", "b", k = 128).head()
    assert(BigInt(r2.getAs[String]("theta_str")) < (BigInt(1) << 64))
    assert(!r2.isNullAt(r2.fieldIndex("est_inter6")))
    assert(!r2.isNullAt(r2.fieldIndex("est_union6")))
  }

  test("hllMaintain: wave-upserted registers equal the one-shot sketch") {
    val rnd = new scala.util.Random(23)
    val vals = Seq.fill(4000)(rnd.nextLong()).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val df = vals.toDF("id", "v")
    val path = java.nio.file.Files
      .createTempDirectory("graft_hll_inc_").toString + "/regs"
    (0 until 4).foreach { w =>
      SketchFunctions.hllMaintain(spark, path,
        df.filter(col("id") % 4 === w), col("v"), 8)
    }
    val maintained = graft.storage.VersionedTable.read(spark, path)
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("m")).toMap
    val oneShot = SketchFunctions.hllBuckets(df, col("v"), 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(maintained == oneShot)
  }

  test("cms: estimates are one-sided (est >= exact) and exact without collisions") {
    // zipf-ish stream over 40 distinct items: 40 << 256 columns, but
    // byte-slice collisions can still happen — est >= exact always
    val rows = (0 until 40).flatMap(i => Seq.fill(41 - i)(s"w$i"))
    val df = rows.toDF("item")
    val sketch = SketchFunctions.cmsSketch(df, col("item"))
    val est = SketchFunctions.cmsEstimate(sketch, df, col("item"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"$k: est ${est(k)} < exact $n")
    }
    // total overestimate bounded by collisions; most items exact at this density
    assert(exact.count { case (k, n) => est(k) == n } >= 30)
    // an item whose 4 cells are all empty estimates exactly 0
    val unseen = SketchFunctions.cmsEstimate(sketch,
      Seq.tabulate(50)(i => s"zz$i").toDF("item"), col("item"))
      .collect().map(_.getLong(1))
    assert(unseen.min == 0L)
  }

  test("cms merge = cell-wise sum; sketch is partitioning-invariant") {
    val a = (0 until 500).map(i => s"k${i % 23}").toDF("item")
    val b = (0 until 300).map(i => s"k${i % 17}").toDF("item")
    val merged = SketchFunctions.cmsSketch(a, col("item"))
      .unionByName(SketchFunctions.cmsSketch(b, col("item")))
      .groupBy("r", "c").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = SketchFunctions.cmsSketch(a.unionByName(b).repartition(13), col("item"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("kmv plan pre-trims map-side: Partial WindowGroupLimit below the exchange") {
    val df = (0L until 5000L).map(v => (v, s"t${v % 3}")).toDF("v", "st")
    val plan = SketchFunctions.kmvMins(df, col("v"), 64, Seq("st"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      s"no partial group-limit pre-trim:\n$plan")
  }

  test("kmv sketch is partitioning-invariant") {
    val df = (0L until 3000L).map(v => (v, s"t${v % 3}")).toDF("v", "st")
    val a = SketchFunctions.kmvMins(df, col("v"), 64, Seq("st"))
      .orderBy("st", "rk").collect().toSeq
    val b = SketchFunctions.kmvMins(df.repartition(17), col("v"), 64, Seq("st"))
      .orderBy("st", "rk").collect().toSeq
    assert(a == b)
  }
}
