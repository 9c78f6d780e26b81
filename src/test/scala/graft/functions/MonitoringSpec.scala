package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MonitoringSpec extends SparkSpec {
  import spark.implicits._

  test("profile: exact counts, nulls, distinct, mean") {
    val df = Seq(Some(1.0), Some(2.0), Some(2.0), None, Some(5.0))
      .toDF("x")
    val r = Monitoring.profile(df, Seq("x")).head
    assert(r.getString(0) == "x")
    assert(r.getLong(1) == 5L && r.getLong(2) == 1L && r.getLong(3) == 3L)
    assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 5.0)
    assert(r.getDouble(6) == 2.5) // (1+2+2+5)/4
  }

  test("driftHistogram: hand-computed buckets incl. edge clamping") {
    val df = Seq(("a", 0.0), ("a", 0.1), ("a", 0.95), ("a", 1.0), ("b", 0.5), ("b", -0.2))
      .toDF("split", "v")
    val got = Monitoring.driftHistogram(df, "split", "v", 0.0, 1.0, 10)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got(("a", 0L)) == 1L)  // 0.0
    assert(got(("a", 1L)) == 1L)  // 0.1
    assert(got(("a", 9L)) == 2L)  // 0.95 and the clamped 1.0
    assert(got(("b", 5L)) == 1L)
    assert(got(("b", 0L)) == 1L)  // below-range value clamps into bucket 0
  }

  test("ksDrift: 0 for identical splits, 1 for fully separated splits") {
    val same = (1 to 500).flatMap(i => Seq(("train", i % 10 / 10.0), ("serve", i % 10 / 10.0)))
      .toDF("split", "v")
    assert(Monitoring.ksDrift(same, "split", "train", "serve", "v", 0.0, 1.0, 10)
      .head.getDouble(3) == 0.0)
    val disjoint = ((1 to 500).map(i => ("train", i % 10 / 20.0)) ++
      (1 to 500).map(i => ("serve", 0.5 + i % 10 / 20.0))).toDF("split", "v")
    assert(Monitoring.ksDrift(disjoint, "split", "train", "serve", "v", 0.0, 1.0, 10)
      .head.getDouble(3) == 1.0, "fully separated distributions reach the max CDF gap")
  }

  test("ksDrift: empty splits guarded — one empty ⇒ 1.0, both empty ⇒ 0.0, no NULLs") {
    // a missing split previously divided by a zero total → NULL ks → drift
    // alerting silently skipped (round-7 advice)
    val oneSided = (1 to 100).map(i => ("train", i % 10 / 10.0)).toDF("split", "v")
    assert(Monitoring.ksDrift(oneSided, "split", "train", "serve", "v", 0.0, 1.0, 10)
      .head.getDouble(3) == 1.0, "exactly one empty split must read as maximal drift")
    assert(Monitoring.ksDrift(oneSided, "split", "serve", "train", "v", 0.0, 1.0, 10)
      .head.getDouble(3) == 1.0, "guard must be symmetric in base/compare")
    val neither = oneSided.filter($"split" === "nope")
    assert(Monitoring.ksDrift(neither, "split", "train", "serve", "v", 0.0, 1.0, 10)
      .head.getDouble(3) == 0.0, "both splits empty must read as no drift, not NULL")
    // out-of-range values still clamp into end buckets, not vanish
    val allNull = Seq(("train", Option.empty[Double]), ("serve", Option.empty[Double]))
      .toDF("split", "v")
    assert(Monitoring.ksDrift(allNull, "split", "train", "serve", "v", 0.0, 1.0, 10)
      .head.getDouble(3) == 0.0, "all-NULL values filter to empty splits → 0.0")
  }

  test("psi is a single lazy plan (no driver round-trip) and matches its prior value") {
    val shifted = ((1 to 500).map(i => ("train", i % 10 / 20.0)) ++
      (1 to 500).map(i => ("serve", 0.5 + i % 10 / 20.0))).toDF("split", "v")
    val df = Monitoring.psi(shifted, "split", "train", "serve", "v", 0.0, 1.0, 10)
    // a LocalRelation output would mean the operator collected internally
    assert(!df.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.getClass.getSimpleName.contains("LocalRelation")),
      "psi must return the lazy plan, not a collected LocalRelation")
    assert(df.head.getDouble(3) > 0.25)
  }

  test("trailing windows: inclusive frame edges, per-key isolation, tie handling") {
    // key a: events at t=0, 50, 100, 160; 100-micros window
    //   t=100's frame [0,100] includes t=0 (inclusive lower edge)
    //   t=160's frame [60,160] drops t=0 and t=50... keeps 100,160
    // key b: two events at the SAME t — RANGE includes both in each frame
    val df = Seq(
      ("a", 0L, 1.0), ("a", 50L, 2.0), ("a", 100L, 4.0), ("a", 160L, 8.0),
      ("b", 100L, 10.0), ("b", 100L, 20.0)
    ).toDF("k", "ts_us", "v")
    val got = WindowFeatures.trailing(df, Seq("k"), "ts_us", "v", Seq(("w", 100L)))
      .select($"k", $"ts_us", $"v", $"cnt_w", $"sum_w")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    assert(got(("a", 0L, 1.0)) == ((1L, 1.0)))
    assert(got(("a", 50L, 2.0)) == ((2L, 3.0)))
    assert(got(("a", 100L, 4.0)) == ((3L, 7.0)), "lower edge t=0 is INSIDE [0,100]")
    assert(got(("a", 160L, 8.0)) == ((2L, 12.0)))
    assert(got(("b", 100L, 10.0)) == ((2L, 30.0)), "ties share the frame")
    assert(got(("b", 100L, 20.0)) == ((2L, 30.0)))
  }

  test("psi: ~0 for identical splits, large for disjoint splits, null-safe") {
    val same = (1 to 500).flatMap(i => Seq(("train", i % 10 / 10.0), ("serve", i % 10 / 10.0)))
      .toDF("split", "v")
    val psiSame = Monitoring.psi(same, "split", "train", "serve", "v", 0.0, 1.0, 10)
      .head.getDouble(3)
    assert(psiSame == 0.0, s"identical distributions must have PSI 0, got $psiSame")
    val shifted = ((1 to 500).map(i => ("train", i % 10 / 20.0)) ++
      (1 to 500).map(i => ("serve", 0.5 + i % 10 / 20.0))).toDF("split", "v")
    val psiShift = Monitoring.psi(shifted, "split", "train", "serve", "v", 0.0, 1.0, 10)
      .head.getDouble(3)
    assert(psiShift > 0.25, s"disjoint distributions must flag action, got $psiShift")
  }

  test("expectations: exact fail counts, NULL predicate fails, dup groups count all rows") {
    import Monitoring.{Expectation => E}
    val df = Seq(
      (1L, "a", Some(5L)), (2L, "a", Some(50L)), (3L, "b", None),
      (3L, "zz", Some(7L)), (4L, "a", Some(5L)))
      .toDF("id", "cat", "v")
    val got = Monitoring.expectations(df, Seq(
        E.notNull("v"),
        E.acceptedValues("cat", Seq("a", "b")),
        E.inRange("v", 0L, 10L)),
      uniqueCols = Seq("id"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got("not_null(v)") == ((5L, 1L, false)))
    assert(got("accepted_values(cat)") == ((5L, 1L, false))) // "zz"
    assert(got("range(v,0,10)") == ((5L, 2L, false))) // 50 + the NULL
    assert(got("unique(id)") == ((5L, 2L, false))) // both id=3 rows
  }

  test("classBalance: exact Gini at the uniform/degenerate/analytic points") {
    val rows = Seq.fill(50)(("uni", "a")) ++ Seq.fill(50)(("uni", "b")) ++
      Seq.fill(100)(("one", "x")) ++
      (Seq.fill(75)(("skew", "m")) ++ Seq.fill(25)(("skew", "n")))
    val got = Monitoring.classBalance(rows.toDF("k", "l"), col("l"), Seq("k"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("uni") == ((100L, 2L, 500000L, 500000L)))   // gini = 1/2
    assert(got("one") == ((100L, 1L, 0L, 1000000L)))       // pure class
    // skew 3:1 → gini = 1 − (9+1)/16 = 6/16 = 0.375
    assert(got("skew") == ((100L, 2L, 375000L, 750000L)))
  }

  test("corrCensus: perfect/anti/zero correlation and constant-column NULL") {
    val rows =
      (0L until 100L).map(i => ("lin", i, 3 * i + 7)) ++      // r = 1
      (0L until 100L).map(i => ("anti", i, 1000 - 2 * i)) ++  // r = -1
      (0L until 100L).map(i => ("flat", i, 42L))              // zero variance
    val got = Monitoring.corrCensus(rows.toDF("k", "x", "y"),
      col("x"), col("y"), Seq("k"))
      .collect().map(r => r.getString(0) ->
        (Option(r.get(5)).map(_.asInstanceOf[Long]), r.getLong(6))).toMap
    assert(got("lin") == ((Some(1000000L), 1L)), s"lin: ${got("lin")}")
    assert(got("anti") == ((Some(1000000L), -1L)), s"anti: ${got("anti")}")
    assert(got("flat") == ((None, 0L)), s"flat: ${got("flat")}")
    // independence: alternating y over increasing x → ppm near zero
    val ind = Monitoring.corrCensus(
      (0L until 1000L).map(i => ("i", i, i % 2)).toDF("k", "x", "y"),
      col("x"), col("y"), Seq("k")).head
    assert(ind.getLong(5) < 1000L, s"independent ppm: ${ind.getLong(5)}")
  }

  test("corrCensus: moments past the DECIMAL(38,0) exactness bound fail loudly") {
    // three rows around 1e8 → every LONG sum is fine (Σx² = 5e16) but
    // s_xx = n·Σx² − (Σx)² = 6e16 > the 1e16 bound, so s_xx²·1e6 ≈ 4e39
    // would overflow DECIMAL(38,0); the old code silently NULLed the ppm
    // (ADVICE r14)
    val rows = Seq(("g", 0L, 0L), ("g", 100000000L, 1L), ("g", 200000000L, 2L))
    val ex = intercept[Exception] {
      Monitoring.corrCensus(rows.toDF("k", "x", "y"),
        col("x"), col("y"), Seq("k")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("exactness bound")),
      s"wrong failure: ${ex.getMessage}")
  }

  test("robustOutliers: planted spikes flagged, median/MAD exact, bulk untouched") {
    // tight bulk around 100 with two planted spikes per group
    val rows = (0L until 200L).map(i => ("g", 100L + (i % 5))) ++
      Seq(("g", 10000L), ("g", -5000L)) ++
      (0L until 100L).map(i => ("h", 50L + (i % 3)))
    val out = Monitoring.robustOutliers(rows.toDF("k", "v"), col("v"), Seq("k"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (gn, gmed, gmad, gout) = out("g")
    // devs sorted: 40×0 then 80×1 — rank 101 lands on 1
    assert(gn == 202L && gmed == 102L && gmad == 1L && gout == 2L,
      s"g: ${out("g")}")
    assert(out("h")._4 == 0L, s"h must have no outliers: ${out("h")}")
  }

  test("decayedSum: power-of-two weights halve per half-life; future rows carry nothing") {
    import java.sql.Date
    val d = Seq(
      (1L, "2024-02-01", 100L), // age 0  → ×256
      (1L, "2024-01-25", 100L), // age 7  → ×128
      (1L, "2024-01-11", 100L), // age 21 → ×32
      (1L, "2023-06-01", 100L), // age >56 → 0
      (1L, "2024-03-01", 100L)) // future → 0
      .toDF("u", "ds", "cents")
      .select(col("u"), col("ds").cast("date").as("day"), col("cents"))
    val got = WindowFeatures.decayedSum(
      d, Seq("u"), col("day"), col("cents"),
      lit(Date.valueOf("2024-02-01")), halfLifeDays = 7, maxK = 8)
      .head
    assert(got.getAs[Long]("n_rows") == 5L)
    assert(got.getAs[Long]("decayed") == 100L * (256 + 128 + 32))
  }

  test("expectations failFast names every violated rule; passing set returns quietly") {
    import Monitoring.{Expectation => E}
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "cat")
    // all pass
    val ok = Monitoring.expectations(df, Seq(E.notNull("cat")),
      uniqueCols = Seq("id"), failFast = true)
    assert(ok.collect().forall(_.getBoolean(3)))
    val e = intercept[IllegalArgumentException] {
      Monitoring.expectations(df, Seq(E.acceptedValues("cat", Seq("a"))),
        failFast = true)
    }
    assert(e.getMessage.contains("accepted_values(cat)") &&
      e.getMessage.contains("1 rows"))
  }
}
