package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.core.FeatureStore
import graft.model._
import graft.refresh.RefreshManager

/** End-to-end feature-store workflows as driver-checkable queries
  * (SURVEY §2.A + §3): catalog registration/discovery, FV chaining, managed
  * refresh, and `generateDataset` — each one runs the REAL FeatureStore API
  * against a throwaway catalog and returns a deterministic DataFrame whose
  * oracle is plain SQL (or literal rows for pure-metadata listings).
  */
object FeatureStoreQueries {
  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** Fresh throwaway FS rooted in a temp dir; queries must be re-runnable. */
  private def tempStore(spark: SparkSession): FeatureStore =
    FeatureStore(spark, Files.createTempDirectory("graft_fs_").toString)

  /** Events (user_id, ts, value) landed as four stats-bearing append
    * segments on the QUARTILE boundaries of the corpus's own ts range —
    * the micro-batch shape the round-10 storage maintenance ops (q96
    * retention, q97 optimize) operate on. Boundaries derive from the data
    * (min/max + integer arithmetic restated identically in the DuckDB
    * oracles), so a corpus regeneration with a different time range
    * cannot silently diverge the two sides. Returns (path, boundaries) —
    * 5 epoch-micros values; boundaries(2) is q96's retention cutoff.
    */
  private def slicedEventsTable(s: SparkSession, dir: String): (String, Seq[Long]) = {
    val path = Files.createTempDirectory("graft_fs_sliced_").toString
    val ev = Tables.events(s, dir).select(col("user_id"), col("ts"), col("value"))
    val r = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head
    val (t0, t1) = (r.getLong(0), r.getLong(1))
    val bounds = (0 to 4).map(i => t0 + (t1 - t0 + 1) * i / 4)
    bounds.sliding(2).foreach { case Seq(lo, hi) =>
      val slice = ev.filter(unix_micros(col("ts")).between(lo, hi - 1))
      graft.storage.VersionedTable.append(path,
        stats = Some(graft.storage.VersionedTable.SegStats("ts", lo, hi - 1)))(
        d => slice.coalesce(1).write.parquet(d))
    }
    (path, bounds)
  }

  /** Register the standard demo objects used by the FS queries:
    * entity user(user_id); a static FV of per-user view-history and a
    * derived FV chained on it (reference FV-chaining,
    * test_derived_customer_features.sql:36).
    */
  private def registerDemo(fs: FeatureStore, spark: SparkSession, dir: String): Unit = {
    Tables.events(spark, dir).createOrReplaceTempView("events_src")
    fs.registerEntity(Entity("user", Seq("user_id"), "event actor"))
    fs.registerFeatureView(FeatureView(
      name = "user_view_features",
      entities = Seq(Entity("user", Seq("user_id"))),
      query = """SELECT user_id, ts, max(value) AS f_view_value
                |FROM events_src WHERE event_type = 'view'
                |GROUP BY user_id, ts""".stripMargin,
      timestampCol = Some("ts"),
      description = "max view value per user per instant"), "1.0")
    // chained FV: reads the first FV by name (resolved as a Spark view)
    fs.registerFeatureView(FeatureView(
      name = "user_view_derived",
      entities = Seq(Entity("user", Seq("user_id"))),
      query = """SELECT user_id, ts, f_view_value,
                |  f_view_value * 2 AS f_view_doubled,
                |  CASE WHEN f_view_value < 50 THEN 'low'
                |       WHEN f_view_value < 150 THEN 'mid'
                |       ELSE 'high' END AS f_view_bucket
                |FROM user_view_features""".stripMargin,
      timestampCol = Some("ts")), "1.0")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A2/A7/A9 — entity + FV registration and catalog discovery
    "q16_fs_catalog" -> ((s, dir) => {
      val fs = tempStore(s)
      registerDemo(fs, s, dir)
      fs.registerFeatureView(FeatureView(
        name = "user_purchase_agg",
        entities = Seq(Entity("user", Seq("user_id"))),
        query = """SELECT user_id, count(*) AS f_n_purchases
                  |FROM events_src WHERE event_type = 'purchase' GROUP BY user_id""".stripMargin,
        refresh = Some(RefreshConfig("1 minute", RefreshMode.Auto))), "2.0")
      fs.listFeatureViews()
        .select("name", "version", "object_type", "entities", "timestamp_col",
          "refresh_freq", "refresh_mode")
    }),

    // §3.3 — generateDataset: the reference's training-dataset read path
    "q17_fs_dataset" -> ((s, dir) => {
      val fs = tempStore(s)
      registerDemo(fs, s, dir)
      val spine = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value").as("label"))
      fs.generateDataset(
        name = "purchase_training",
        spine = spine,
        features = Seq(("user_view_features", "1.0")),
        spineTimestampCol = Some("ts"),
        labelCols = Seq("label"),
        save = false)
    }),

    // FV chaining (B1 ref→FV): query the derived FV; Catalyst collapses the
    // two view layers into one plan
    "q18_fv_chain" -> ((s, dir) => {
      val fs = tempStore(s)
      registerDemo(fs, s, dir)
      fs.readFeatureView("user_view_derived", "1.0")
    }),

    // A4/C1-C5 — managed FV: materialize + refreshOnce, then read the table
    "q19_managed" -> ((s, dir) => {
      val fs = tempStore(s)
      Tables.events(s, dir).createOrReplaceTempView("events_src")
      fs.registerEntity(Entity("user", Seq("user_id")))
      fs.registerFeatureView(FeatureView(
        name = "user_event_profile",
        entities = Seq(Entity("user", Seq("user_id"))),
        query = """SELECT user_id,
                  |  count(*) AS f_n_events,
                  |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS f_total_value,
                  |  count(DISTINCT event_type) AS f_n_types
                  |FROM events_src GROUP BY user_id""".stripMargin,
        // ON_SCHEDULE: registration only records metadata; the refreshOnce
        // below performs the (single) FULL materialization — the same final
        // table as ON_CREATE + refresh, without materializing twice.
        refresh = Some(RefreshConfig("1 minute", RefreshMode.Full,
          InitializeMode.OnSchedule))), "1.0")
      val mgr = new RefreshManager(fs)
      mgr.refreshOnce(fs.getFeatureView("user_event_profile", "1.0"))
      fs.readFeatureView("user_event_profile", "1.0")
    }),

    // A7 — entity discovery (reference list_entities macro)
    "q36_fs_entities" -> ((s, dir) => {
      val fs = tempStore(s)
      registerDemo(fs, s, dir)
      fs.registerEntity(Entity("session", Seq("user_id", "event_id"), "composite key"))
      fs.listEntities()
    }),

    // A10/C8 — feature-view describe/readback (SHOW DYNAMIC TABLES shape)
    "q35_fs_describe" -> ((s, dir) => {
      val fs = tempStore(s)
      registerDemo(fs, s, dir)
      fs.registerFeatureView(FeatureView(
        name = "user_purchase_agg",
        entities = Seq(Entity("user", Seq("user_id"))),
        query = """SELECT user_id, count(*) AS f_n_purchases
                  |FROM events_src WHERE event_type = 'purchase' GROUP BY user_id""".stripMargin,
        refresh = Some(RefreshConfig("1 minute", RefreshMode.Auto, InitializeMode.OnCreate, "wh1"))), "2.0")
      fs.describeFeatureView("user_purchase_agg", "2.0")
        .select("name", "version", "logical_id", "object_type", "entities",
          "refresh_freq", "refresh_mode", "initialize", "warehouse", "is_materialized")
    }),

    // 2-hop FV chain: base → intermediate → final, read through the real
    // generateDataset path (reference test_multi_hop_feature_view_chain,
    // test_feature_store_workflows.py:368-414)
    "q46_fv_chain_2hop" -> ((s, dir) => {
      val fs = tempStore(s)
      Tables.events(s, dir).createOrReplaceTempView("events_src")
      fs.registerEntity(Entity("user", Seq("user_id")))
      fs.registerFeatureView(FeatureView(
        name = "chain_base",
        entities = Seq(Entity("user", Seq("user_id"))),
        query = """SELECT user_id, ts, max(value) AS f_base
                  |FROM events_src WHERE event_type = 'view'
                  |GROUP BY user_id, ts""".stripMargin,
        timestampCol = Some("ts")), "1")
      fs.registerFeatureView(FeatureView(
        name = "chain_mid",
        entities = Seq(Entity("user", Seq("user_id"))),
        query = "SELECT user_id, ts, f_base * 12 AS f_months FROM chain_base",
        timestampCol = Some("ts")), "1")
      fs.registerFeatureView(FeatureView(
        name = "chain_final",
        entities = Seq(Entity("user", Seq("user_id"))),
        query = "SELECT user_id, ts, f_months, f_months / 365.0D AS f_years FROM chain_mid",
        timestampCol = Some("ts")), "1")
      val spine = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value").as("label"))
      fs.generateDataset(
        name = "chain_training",
        spine = spine,
        features = Seq(("chain_final", "1")),
        spineTimestampCol = Some("ts"),
        labelCols = Seq("label"),
        save = false)
    }),

    // Metadata-structure introspection over the REAL stored catalog JSON —
    // from_json + explode (B11/B12) standing in for the reference's
    // PARSE_JSON + LATERAL FLATTEN validation
    // (integration_tests/tests/test_feature_view_metadata_structure.sql)
    "q47_metadata_structure" -> ((s, dir) => {
      val fs = tempStore(s)
      registerDemo(fs, s, dir)
      fs.registerEntity(Entity("session", Seq("user_id", "event_id"), "composite key"))
      fs.registerFeatureView(FeatureView(
        name = "session_fv",
        entities = Seq(Entity("session", Seq("user_id", "event_id"))),
        query = "SELECT user_id, event_id, value AS f_val FROM events_src"), "1")
      val entSchema = org.apache.spark.sql.types.StructType.fromDDL(
        "entities ARRAY<STRUCT<name: STRING, joinKeys: ARRAY<STRING>>>")
      fs.rawMetadata()
        .select(col("object_name"), from_json(col("tag_value"), entSchema).getField("entities").as("ents"))
        .select(col("object_name"), explode(col("ents")).as("e"))
        .select(
          col("object_name"),
          col("e.name").as("entity_name"),
          concat_ws(",", col("e.joinKeys")).as("join_keys"),
          size(col("e.joinKeys")).cast("long").as("n_join_keys"),
          // the reference's violation predicate, verbatim
          (col("e.name").isNull || col("e.joinKeys").isNull ||
            size(col("e.joinKeys")) === 0 ||
            col("e.name") =!= upper(col("e.name"))).as("is_violation"))
    }),

    // C2 INCREMENTAL — Structured Streaming maintains the managed FV; the
    // drained stream must equal the batch recompute (dynamic-table parity)
    // retention (round-10 storage op): land events as four stats-bearing
    // time-slice append segments, expire everything before Jan 15 via the
    // segment-skipping range DELETE, and return the per-user aggregate of
    // what remains — the oracle recomputes it from raw events with the same
    // cutoff, so dropping too much OR too little hash-fails.
    "q96_fs_retention" -> ((s, dir) => {
      val (path, bounds) = slicedEventsTable(s, dir)
      graft.storage.VersionedTable.deleteRange(
        s, path, "ts", Long.MinValue, bounds(2) - 1)
      graft.storage.VersionedTable.read(s, path)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("f_n"),
          sum(dec(col("value"))).cast("double").as("f_sum"))
    }),

    // OPTIMIZE (round-10 storage op): same sliced table, compacted with a
    // 2-dim ZORDER rewrite — the result must be byte-identical content
    // (the oracle aggregates ALL raw events) and exactly one live segment.
    "q97_fs_optimize" -> ((s, dir) => {
      val (path, _) = slicedEventsTable(s, dir)
      graft.storage.VersionedTable.optimize(
        s, path, numFiles = 8, zorderBy = Seq("user_id", "ts"), statsCol = Some("ts"))
      val m = graft.storage.VersionedTable.readManifest(path).get
      graft.storage.VersionedTable.read(s, path)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("f_n"),
          sum(dec(col("value"))).cast("double").as("f_sum"))
        .withColumn("n_segments", lit(m.segments.size))
    }),

    "q37_fs_incremental" -> ((s, dir) => {
      val fs = tempStore(s)
      // batch view first so registration-time validation can analyze the query
      val raw = s.read.parquet(s"$dir/events.parquet")
      raw.createOrReplaceTempView("inc_events")
      fs.registerEntity(Entity("user", Seq("user_id")))
      fs.registerFeatureView(FeatureView(
        name = "user_type_profile",
        entities = Seq(Entity("user", Seq("user_id"))),
        query = """SELECT user_id, event_type,
                  |  count(*) AS f_n,
                  |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS f_sum
                  |FROM inc_events GROUP BY user_id, event_type""".stripMargin,
        refresh = Some(RefreshConfig("1 minute", RefreshMode.Incremental,
          InitializeMode.OnSchedule))), "1")
      val mgr = new RefreshManager(fs)
      val q = mgr.startIncremental(
        fs.getFeatureView("user_type_profile", "1"),
        "inc_events", dir, raw.schema, availableNow = true,
        pathGlobFilter = Some("events.parquet"))
      q.awaitTermination(300000)
      mgr.stopAll()
      fs.readFeatureView("user_type_profile", "1")
    }),

    // A9/C-plane — managed-FV TIME TRAVEL (reproducible training reads):
    // two FULL refreshes of the same FV with the source view changed in
    // between (view-events only, then all events); `asOfTableVersion = 1`
    // must serve the FIRST materialization byte-for-byte even though the
    // current manifest has moved on — the guarantee that a training run
    // pinned to a table version re-reads identical features tomorrow.
    // Snapshot retention is manifest-based (vacuum keeps 8 generations),
    // so at 100 TB this is a metadata read: no copy-on-refresh anywhere.
    "q132_fs_time_travel" -> ((s, dir) => {
      val fs = tempStore(s)
      val ev = Tables.events(s, dir)
      fs.registerEntity(Entity("user", Seq("user_id")))
      ev.filter(col("event_type") === "view").createOrReplaceTempView("tt_src")
      fs.registerFeatureView(FeatureView(
        name = "user_tt_profile",
        entities = Seq(Entity("user", Seq("user_id"))),
        query = """SELECT user_id, count(*) AS f_n,
                  |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS f_sum
                  |FROM tt_src GROUP BY user_id""".stripMargin,
        refresh = Some(RefreshConfig("1 minute", RefreshMode.Full,
          InitializeMode.OnSchedule))), "1")
      val mgr = new RefreshManager(fs)
      val rec = fs.getFeatureView("user_tt_profile", "1")
      mgr.refreshOnce(rec)                       // table_version 1
      ev.createOrReplaceTempView("tt_src")       // source moves on
      mgr.refreshOnce(rec)                       // table_version 2
      val v1 = fs.readFeatureView("user_tt_profile", "1", asOfTableVersion = Some(1L))
        .withColumn("snap", lit("v1"))
      val cur = fs.readFeatureView("user_tt_profile", "1")
        .withColumn("snap", lit("v2"))
      v1.unionByName(cur).select(col("snap"), col("user_id"), col("f_n"), col("f_sum"))
    }))

  val oracleSql: Map[String, String] = Map(
    // pure-metadata listing → literal oracle rows
    "q16_fs_catalog" ->
      """SELECT * FROM (VALUES
        |  ('USER_PURCHASE_AGG', '2.0', 'MANAGED_FEATURE_VIEW', 'USER', NULL, '1 minute', 'AUTO'),
        |  ('USER_VIEW_DERIVED', '1.0', 'EXTERNAL_FEATURE_VIEW', 'USER', 'TS', NULL, NULL),
        |  ('USER_VIEW_FEATURES', '1.0', 'EXTERNAL_FEATURE_VIEW', 'USER', 'TS', NULL, NULL)
        |) AS t(name, version, object_type, entities, timestamp_col, refresh_freq, refresh_mode)""".stripMargin,

    "q17_fs_dataset" ->
      """WITH spine AS (
        |  SELECT event_id, user_id, ts, value AS label FROM events WHERE event_type = 'purchase'
        |), feat AS (
        |  SELECT user_id, ts, max(value) AS f_view_value FROM events
        |  WHERE event_type = 'view' GROUP BY user_id, ts
        |)
        |SELECT s.event_id, s.user_id, s.ts, s.label, f.f_view_value
        |FROM spine s ASOF LEFT JOIN feat f
        |  ON s.user_id = f.user_id AND f.ts <= s.ts""".stripMargin,

    "q18_fv_chain" ->
      """WITH base AS (
        |  SELECT user_id, ts, max(value) AS f_view_value FROM events
        |  WHERE event_type = 'view' GROUP BY user_id, ts
        |)
        |SELECT user_id, ts, f_view_value,
        |  f_view_value * 2 AS f_view_doubled,
        |  CASE WHEN f_view_value < 50 THEN 'low'
        |       WHEN f_view_value < 150 THEN 'mid'
        |       ELSE 'high' END AS f_view_bucket
        |FROM base""".stripMargin,

    "q19_managed" ->
      """SELECT user_id,
        |  count(*) AS f_n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS f_total_value,
        |  count(DISTINCT event_type) AS f_n_types
        |FROM events GROUP BY user_id""".stripMargin,

    "q36_fs_entities" ->
      """SELECT * FROM (VALUES
        |  ('SESSION', 'USER_ID,EVENT_ID', 'composite key'),
        |  ('USER', 'USER_ID', 'event actor')
        |) AS t(name, join_keys, description)""".stripMargin,

    "q35_fs_describe" ->
      """SELECT 'USER_PURCHASE_AGG' AS name, '2.0' AS version,
        |  'USER_PURCHASE_AGG$2.0' AS logical_id,
        |  'MANAGED_FEATURE_VIEW' AS object_type,
        |  'USER(USER_ID)' AS entities,
        |  '1 minute' AS refresh_freq, 'AUTO' AS refresh_mode,
        |  'ON_CREATE' AS initialize, 'wh1' AS warehouse,
        |  TRUE AS is_materialized""".stripMargin,

    "q46_fv_chain_2hop" ->
      """WITH base AS (
        |  SELECT user_id, ts, max(value) AS f_base FROM events
        |  WHERE event_type = 'view' GROUP BY user_id, ts
        |), mid AS (
        |  SELECT user_id, ts, f_base * 12 AS f_months FROM base
        |), fin AS (
        |  SELECT user_id, ts, f_months, f_months / 365.0 AS f_years FROM mid
        |), spine AS (
        |  SELECT event_id, user_id, ts, value AS label FROM events WHERE event_type = 'purchase'
        |)
        |SELECT s.event_id, s.user_id, s.ts, s.label, f.f_months, f.f_years
        |FROM spine s ASOF LEFT JOIN fin f
        |  ON s.user_id = f.user_id AND f.ts <= s.ts""".stripMargin,

    "q47_metadata_structure" ->
      """SELECT * FROM (VALUES
        |  ('SESSION_FV$1', 'SESSION', 'USER_ID,EVENT_ID', CAST(2 AS BIGINT), FALSE),
        |  ('USER_VIEW_DERIVED$1.0', 'USER', 'USER_ID', CAST(1 AS BIGINT), FALSE),
        |  ('USER_VIEW_FEATURES$1.0', 'USER', 'USER_ID', CAST(1 AS BIGINT), FALSE)
        |) AS t(object_name, entity_name, join_keys, n_join_keys, is_violation)""".stripMargin,

    "q37_fs_incremental" ->
      """SELECT user_id, event_type,
        |  count(*) AS f_n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS f_sum
        |FROM events GROUP BY user_id, event_type""".stripMargin,

    // both snapshots restated directly: v1 = the view-only source the
    // first refresh saw, v2 = the full source of the second — time travel
    // must reproduce v1 exactly after the table moved to v2
    "q132_fs_time_travel" ->
      """WITH v1 AS (
        |  SELECT 'v1' AS snap, user_id, count(*) AS f_n,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS f_sum
        |  FROM events WHERE event_type = 'view' GROUP BY user_id
        |), v2 AS (
        |  SELECT 'v2' AS snap, user_id, count(*) AS f_n,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS f_sum
        |  FROM events GROUP BY user_id
        |)
        |SELECT snap, user_id, f_n, f_sum FROM v1
        |UNION ALL
        |SELECT snap, user_id, f_n, f_sum FROM v2""".stripMargin,

    // cutoff = the median quartile boundary of the corpus's OWN ts range,
    // restated with the same integer arithmetic as slicedEventsTable —
    // corpus-adaptive, so a testdata regeneration can't diverge the sides
    "q96_fs_retention" ->
      """WITH r AS (
        |  SELECT epoch_us(min(ts)) AS t0, epoch_us(max(ts)) AS t1 FROM events)
        |SELECT user_id, count(*) AS f_n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS f_sum
        |FROM events, r
        |WHERE epoch_us(ts) >= t0 + (t1 - t0 + 1) * 2 // 4
        |GROUP BY user_id""".stripMargin,

    "q97_fs_optimize" ->
      """SELECT user_id, count(*) AS f_n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS f_sum,
        |  CAST(1 AS INTEGER) AS n_segments
        |FROM events GROUP BY user_id""".stripMargin)
}
