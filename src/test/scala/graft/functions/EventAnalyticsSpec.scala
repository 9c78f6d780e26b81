package graft.functions

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String, Long)*) =
    rows.map { case (id, us, tp, v) =>
      (id, new Timestamp(us / 1000), tp, v / 100.0, us)
    }.toDF("event_id", "ts_ms", "event_type", "value", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        lit(1L).as("user_id"), col("event_type"), col("value"))

  private val M = 60L * 1000000 // one minute in micros

  test("funnel anchors at the first step-1 event and chains strictly forward") {
    // view@0, click@5m, purchase@10m — full chain within a 1h window
    val f = EventAnalytics.funnel(
      ev((1, 0, "view", 100), (2, 5 * M, "click", 100), (3, 10 * M, "purchase", 100)),
      Seq("view", "click", "purchase"), windowUs = 60 * M).collect().head
    assert(f.getAs[Long]("t1_us") == 0 && f.getAs[Long]("t2_us") == 5 * M &&
      f.getAs[Long]("t3_us") == 10 * M && f.getAs[Int]("reached") == 3)
  }

  test("a step out of order does not count: purchase before click breaks the chain") {
    val f = EventAnalytics.funnel(
      ev((1, 0, "view", 100), (2, 5 * M, "purchase", 100), (3, 10 * M, "click", 100)),
      Seq("view", "click", "purchase"), windowUs = 60 * M).collect().head
    assert(f.getAs[Int]("reached") == 2) // click@10m qualifies, no purchase after
    assert(f.isNullAt(f.fieldIndex("t3_us")))
  }

  test("window is anchored at step 1, not per-step") {
    // view@0, click@50m, purchase@70m: purchase is 20m after click but
    // outside the 60m anchor window — chain stops at 2
    val f = EventAnalytics.funnel(
      ev((1, 0, "view", 100), (2, 50 * M, "click", 100), (3, 70 * M, "purchase", 100)),
      Seq("view", "click", "purchase"), windowUs = 60 * M).collect().head
    assert(f.getAs[Int]("reached") == 2)
  }

  test("first-touch anchoring: a later view that WOULD convert does not re-anchor") {
    // view@0 (no conversion in window), view@100m, click@105m: the funnel is
    // anchored at the FIRST view, so the click at 105m is outside 60m
    val f = EventAnalytics.funnel(
      ev((1, 0, "view", 100), (2, 100 * M, "view", 100), (3, 105 * M, "click", 100)),
      Seq("view", "click"), windowUs = 60 * M).collect().head
    assert(f.getAs[Long]("t1_us") == 0 && f.getAs[Int]("reached") == 1)
  }

  test("a user whose step-k events all fail the chain survives with NULL, not dropped") {
    val f = EventAnalytics.funnel(
      ev((1, 10 * M, "view", 100), (2, 5 * M, "click", 100)), // click BEFORE view
      Seq("view", "click"), windowUs = 60 * M).collect()
    assert(f.length == 1 && f.head.getAs[Int]("reached") == 1)
  }

  test("funnelCensus counts stages and exact lags in one pass") {
    val events = ev(
      (1, 0, "view", 100), (2, 5 * M, "click", 100), (3, 10 * M, "purchase", 100))
      .unionByName(ev((4, 0, "view", 100), (5, 7 * M, "click", 100))
        .withColumn("user_id", lit(2L)))
      .unionByName(ev((6, 0, "view", 100)).withColumn("user_id", lit(3L)))
    val c = EventAnalytics.funnelCensus(
      EventAnalytics.funnel(events, Seq("view", "click", "purchase"), 60 * M), 3)
      .collect().map(r => r.getAs[Long]("stage") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("lag_us_total"))).toMap
    assert(c(1L) == ((3L, 0L)))
    assert(c(2L) == ((2L, 12 * M))) // 5m + 7m
    assert(c(3L) == ((1L, 10 * M)))
  }

  test("retention cohorts: offsets are exact week multiples, cohort = first week") {
    // user 1 active in ISO weeks of Jan-01-2024 (Mon) and Jan-15-2024;
    // user 2 first appears Jan-08-2024
    val d = Seq(
      (1L, "2024-01-02 10:00:00"), (1L, "2024-01-17 10:00:00"),
      (2L, "2024-01-08 00:00:00"), (2L, "2024-01-09 23:59:59"))
      .toDF("user_id", "s").select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val got = EventAnalytics.retentionCohorts(d).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    assert(got(("2024-01-01", 0L)) == 1L)
    assert(got(("2024-01-01", 2L)) == 1L)
    assert(got(("2024-01-08", 0L)) == 1L)
    assert(got.size == 3) // user 2's two events collapse into one (user, week)
  }

  test("randomized funnel equals a driver-side brute-force reference") {
    val rnd = new scala.util.Random(31)
    val types = Seq("view", "click", "purchase")
    val events = (0 until 2000).map { i =>
      (i.toLong, rnd.nextInt(40).toLong,
        types(rnd.nextInt(3)), rnd.nextInt(100000).toLong * 1000000L)
    }
    val df = events.map { case (id, u, tp, us) => (id, u, tp, us) }
      .toDF("event_id", "user_id", "event_type", "us")
      .select(col("event_id"), col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"), lit(0.0).as("value"))
    val win = 3600L * 1000000 * 4 // 4 hours
    val got = EventAnalytics.funnel(df, types, win).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (Option(r.get(r.fieldIndex("t2_us"))).map(_.asInstanceOf[Long]),
          Option(r.get(r.fieldIndex("t3_us"))).map(_.asInstanceOf[Long]),
          r.getAs[Long]("t1_us"))).toMap
    // brute force: anchored min-chain
    val byUser = events.groupBy(_._2)
    byUser.foreach { case (u, evs) =>
      val t1 = evs.filter(_._3 == "view").map(_._4).sorted.headOption
      t1 match {
        case None => assert(!got.contains(u))
        case Some(a) =>
          val (gt2, gt3, gt1) = got(u)
          assert(gt1 == a, s"user $u t1")
          val t2 = evs.filter(e => e._3 == "click" && e._4 > a && e._4 <= a + win)
            .map(_._4).sorted.headOption
          assert(gt2 == t2, s"user $u t2: got $gt2 want $t2")
          val t3 = t2.flatMap(b => evs.filter(e =>
            e._3 == "purchase" && e._4 > b && e._4 <= a + win)
            .map(_._4).sorted.headOption)
          assert(gt3 == t3, s"user $u t3: got $gt3 want $t3")
      }
    }
  }

  test("randomized gap-fill equals a driver-side forward-fill reference") {
    val rnd = new scala.util.Random(41)
    val events = (0 until 1500).map { i =>
      (i.toLong, rnd.nextInt(25).toLong,
        rnd.nextInt(40).toLong * 86400000000L + rnd.nextInt(86400) * 1000000L,
        rnd.nextInt(10000) / 100.0)
    }
    val df = events.toDF("event_id", "user_id", "us", "value")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("value"))
    val got = EventAnalytics.gapFillDaily(df).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getDate(1).toString) ->
        (r.getAs[Long]("cents"), r.getAs[Boolean]("observed")))
      .toMap
    events.groupBy(_._2).foreach { case (u, evs) =>
      // reference: per-day last by event_id, forward-filled over the span
      val daily = evs.groupBy(_._3 / 86400000000L).map { case (d, es) =>
        d -> math.floor(es.maxBy(_._1)._4 * 100 + 0.5).toLong
      }
      val (d0, d1) = (daily.keys.min, daily.keys.max)
      var last = 0L
      (d0 to d1).foreach { d =>
        val day = java.time.LocalDate.ofEpochDay(d).toString
        if (daily.contains(d)) last = daily(d)
        val (cents, obs) = got((u, day))
        assert(cents == last && obs == daily.contains(d),
          s"user $u day $day: got ($cents,$obs) want ($last,${daily.contains(d)})")
      }
    }
    assert(got.size == events.groupBy(_._2).map { case (_, es) =>
      val ds = es.map(_._3 / 86400000000L); ds.max - ds.min + 1
    }.sum)
  }

  test("gap-fill: NULL-valued events never define a grid day (ADVICE r14)") {
    val day = 24L * 3600 * 1000000
    val d = Seq(
      (1L, 0L, Some(5.00)),
      (2L, day, None), // NULL value: day 1 must stay unobserved, fill 500
      (3L, 2 * day, Some(1.00)))
      .toDF("event_id", "us", "value")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        lit(7L).as("user_id"), col("value"))
    val g = EventAnalytics.gapFillDaily(d).orderBy(col("day")).collect()
    assert(g.map(_.getAs[Long]("cents")).toSeq == Seq(500L, 500L, 100L))
    assert(g.map(_.getAs[Boolean]("observed")).toSeq == Seq(true, false, true))
    // a user with ONLY NULL-valued events has no observations at all
    val onlyNull = Seq((9L, 0L, Option.empty[Double]))
      .toDF("event_id", "us", "value")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        lit(8L).as("user_id"), col("value"))
    assert(EventAnalytics.gapFillDaily(onlyNull).count() == 0L)
  }

  test("gap-fill: contiguous grid, forward fill carries, event_id breaks day ties") {
    val day = 24L * 3600 * 1000000
    val d = Seq(
      (1L, 0L, 6.55), (3L, 10L, 7.00), // same day: event_id 3 wins → 700
      (9L, 3 * day, 1.23)) // two-day gap
      .toDF("event_id", "us", "value")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        lit(7L).as("user_id"), col("value"))
    val g = EventAnalytics.gapFillDaily(d).orderBy(col("day")).collect()
    assert(g.length == 4)
    assert(g.map(_.getAs[Long]("cents")).toSeq == Seq(700L, 700L, 700L, 123L))
    assert(g.map(_.getAs[Boolean]("observed")).toSeq ==
      Seq(true, false, false, true))
  }
}
