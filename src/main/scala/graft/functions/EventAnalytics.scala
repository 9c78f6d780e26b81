package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table shape
  * (`event_id, ts, user_id, event_type, value`): conversion funnels,
  * retention cohorts, and time-grid gap-fill — the canonical product /
  * feature-pipeline transforms next to q42's sessionization.
  *
  * All three are deterministic, exact-arithmetic contracts (timestamps in
  * epoch micros BIGINT, money-like values in integer cents) so every result
  * restates in ANSI SQL and is partitioning-independent. Reference scope:
  * the feature-store reference materializes exactly this family as
  * incremental feature views (sfc-gh-rsureshbabu/dbt-snowflake-feature-store
  * README.md:160-167 — per-key windowed aggregates over an event stream);
  * funnels/cohorts/gap-fill are the event-table instances a pipeline user
  * materializes daily.
  *
  * Scale notes (100 TB events):
  *  - `funnel` is K sequential `groupBy(user_id)` aggregations, each over a
  *    type-filtered scan (the filter reaches parquet — a step's scan reads
  *    only its event type's row groups under predicate pushdown). The
  *    per-user chain state is one row per user per step, joined on the SAME
  *    key every stage, so AQE co-partitions the whole chain after the first
  *    exchange; nothing is ever user×events.
  *  - `retentionCohorts` is one map-side-combined `min` per user, one
  *    distinct over (user, week) — both shuffles on user_id, reusable — and
  *    a final |cohort×offset| aggregate (bounded by weeks², tiny).
  *  - `gapFillDaily` explodes only the per-user day GRID (bounded by the
  *    observation span in days, not by event count), after events are
  *    pre-aggregated to one row per (user, day). The forward-fill is a
  *    single window over the grid, partitioned by user — state is one value.
  */
object EventAnalytics {

  /** Anchored conversion funnel ("first-touch"): for each user, step 1's
    * time is the user's FIRST step-1 event; step k's time is the first
    * step-k event STRICTLY after step k-1, and every step must land within
    * `windowUs` of step 1. Returns one row per user who reached step 1,
    * with `reached` = deepest step index (1-based) and `t_us(k)` epoch
    * micros per reached step (NULL past `reached`).
    *
    * The min-chain anchors each step at the earliest qualifying timestamp,
    * so the result is a pure function of the event set (ties collapse to
    * the same min — no ordering dependence).
    */
  def funnel(events: DataFrame, steps: Seq[String], windowUs: Long): DataFrame = {
    require(steps.nonEmpty && steps.size <= 8, s"funnel steps 1..8, got ${steps.size}")
    val tUs = unix_micros(col("ts"))
    // step 1: first touch per user.
    var chain = events.filter(col("event_type") === steps.head)
      .groupBy(col("user_id"))
      .agg(min(tUs).as("t1_us"))
    // step k: min ts strictly after step k-1, within windowUs of t1.
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      val k = i + 1
      val stepK = events.filter(col("event_type") === st)
        .select(col("user_id"), tUs.as("__t"))
      // Null-out (don't filter) non-qualifying candidates: a user whose
      // step-k events all fail the chain must SURVIVE with t_k = NULL,
      // not vanish from the funnel.
      chain = chain.join(stepK, Seq("user_id"), "left")
        .withColumn("__tq",
          when(col("__t") > col(s"t${k - 1}_us") &&
            col("__t") <= col("t1_us") + lit(windowUs), col("__t")))
        .groupBy((col("user_id") +: (1 until k).map(j => col(s"t${j}_us"))): _*)
        .agg(min(col("__tq")).as(s"t${k}_us"))
    }
    val reached = steps.indices.drop(1).foldLeft(lit(1)) { case (acc, i) =>
      when(col(s"t${i + 1}_us").isNotNull, lit(i + 1)).otherwise(acc)
    }
    // NULL-out times past the break: once step k is NULL every later step
    // is too (the chain filter guarantees it), so only `reached` matters.
    chain.withColumn("reached", reached.cast("int"))
  }

  /** Stage census over [[funnel]]: one row per stage with users reaching it
    * and the exact total conversion lag (Σ t_k − t_1, micros) among them.
    * ONE aggregation pass (per-stage counts are conditional aggregates of
    * the same funnel relation), then the 1×K row unpivots driver-free.
    */
  def funnelCensus(f: DataFrame, nSteps: Int): DataFrame = {
    val aggs = (1 to nSteps).flatMap { k =>
      Seq(
        count(col(s"t${k}_us")).as(s"__n$k"),
        coalesce(sum(col(s"t${k}_us") - col("t1_us")), lit(0L)).as(s"__l$k"))
    }
    val one = f.agg(aggs.head, aggs.tail: _*)
    val rows = (1 to nSteps).map { k =>
      struct(lit(k.toLong).as("stage"), col(s"__n$k").as("n_users"),
        col(s"__l$k").as("lag_us_total"))
    }
    one.select(explode(array(rows: _*)).as("st")).select(col("st.*"))
  }

  /** Weekly retention cohorts: cohort = ISO week (Monday-truncated date) of
    * the user's first event; one output row per (cohort_week, week_offset)
    * with the distinct-user count active that week. `week_offset` is exact
    * integer day-diff/7 (both dates Monday-aligned, so 7 always divides).
    */
  def retentionCohorts(events: DataFrame): DataFrame =
    retentionFromWeeks(
      events.select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("week")).distinct())

  /** The census half of [[retentionCohorts]] over an already-distinct
    * `(user_id, week)` relation — shared verbatim by the incremental
    * maintenance path ([[graft.streaming.EventAnalyticsStream]]), whose
    * state table IS that relation, so stream and batch can never diverge
    * on the aggregation.
    */
  def retentionFromWeeks(weeks: DataFrame): DataFrame = {
    val cohort = weeks.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    weeks.join(cohort, Seq("user_id"))
      .select(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("long").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Daily gap-fill + forward-fill: per user, a contiguous daily grid from
    * the first to the last event day; each grid day carries the user's
    * last-observed `value` (in exact integer cents) at or before that day.
    * Day-level "last" = the event with the highest `event_id` that day
    * (the deterministic tiebreak identity). Returns the full grid relation
    * `(user_id, day, cents, observed)`.
    */
  def gapFillDaily(events: DataFrame): DataFrame = {
    val day = to_date(col("ts"))
    val cents = floor(col("value") * 100 + lit(0.5)).cast("long")
    // NULL `value` events are not observations (ADVICE r14): without the
    // filter, a user-day whose max-event_id row has NULL value would emit
    // a NULL day_cents that the forward-fill then papers over from an
    // earlier day while `observed` stays true — pinned here and in the
    // q170 oracle as "a NULL-valued event never defines a grid day"
    val daily = events
      .filter(col("value").isNotNull)
      .select(col("user_id"), day.as("day"), col("event_id"), cents.as("cents"))
      .groupBy(col("user_id"), col("day"))
      .agg(max_by(col("cents"), col("event_id")).as("day_cents"))
    gapFillFromDaily(daily)
  }

  /** The grid + forward-fill stage of [[gapFillDaily]] over an already-
    * reduced `(user_id, day, day_cents)` observation relation — split out
    * (round 16) so [[graft.streaming.EventAnalyticsStream.gapFillServe]]
    * serves its maintained state through the SAME code path (the
    * stream ≡ batch contract of the funnel/retention maintainers).
    */
  def gapFillFromDaily(daily: DataFrame): DataFrame = {
    val span = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = span.select(col("user_id"),
      explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        last(col("day_cents"), ignoreNulls = true).over(w).as("cents"),
        col("day_cents").isNotNull.as("observed"))
  }
}
