package graft.model

/** Core data model of the feature store (SURVEY.md §1.1).
  *
  * Mirrors the semantics of the reference's catalog objects
  * (reference: macros/materializations/entity.sql:23-34,
  * macros/materializations/feature_view.sql:36-97) without any of the
  * Snowflake TAG machinery: all metadata lives in [[graft.catalog.MetadataCatalog]].
  */

/** A named join-key set. Pure metadata — never holds data.
  * Reference: macros/materializations/entity.sql:1-39 (names and keys are
  * uppercased on registration; join_keys must be non-empty).
  */
final case class Entity(name: String, joinKeys: Seq[String], description: String = "") {
  require(name.nonEmpty, "entity name must be non-empty")
  require(joinKeys.nonEmpty, "entity requires at least one join key")
  /** Canonical (uppercased) form, as the reference stores it. */
  def canonical: Entity = Entity(name.toUpperCase, joinKeys.map(_.toUpperCase), description)
}

sealed trait RefreshMode
object RefreshMode {
  /** Pick INCREMENTAL when the plan is streamable, else FULL (Snowflake AUTO). */
  case object Auto extends RefreshMode
  case object Full extends RefreshMode
  case object Incremental extends RefreshMode
  def parse(s: String): RefreshMode = s.trim.toUpperCase match {
    case "AUTO" => Auto
    case "FULL" => Full
    case "INCREMENTAL" => Incremental
    case other => throw new IllegalArgumentException(s"unknown refresh_mode: $other")
  }
  def render(m: RefreshMode): String = m match {
    case Auto => "AUTO"; case Full => "FULL"; case Incremental => "INCREMENTAL"
  }
}

sealed trait InitializeMode
object InitializeMode {
  case object OnCreate extends InitializeMode
  case object OnSchedule extends InitializeMode
  def parse(s: String): InitializeMode = s.trim.toUpperCase match {
    case "ON_CREATE" => OnCreate
    case "ON_SCHEDULE" => OnSchedule
    case other => throw new IllegalArgumentException(s"unknown initialize: $other")
  }
  def render(m: InitializeMode): String = m match {
    case OnCreate => "ON_CREATE"; case OnSchedule => "ON_SCHEDULE"
  }
}

/** What to do when a managed FV is re-registered with changed config but an
  * unchanged query (reference: feature_view.sql:145-174).
  */
sealed trait OnConfigChange
object OnConfigChange {
  case object Apply extends OnConfigChange
  case object Continue extends OnConfigChange
  case object Fail extends OnConfigChange
}

/** Declarative incremental maintenance for a managed FV whose aggregate
  * is one of the event-analytics maintainers (round 16 — VERDICT r15 #8:
  * the reference's core concept, an incrementally-refreshed FV over an
  * event stream, served through the PUBLIC API): the FV `query` names the
  * EVENT relation to fold, the maintainer defines fold + serve, and the
  * FV's VersionedTable IS the maintenance state (so `describeFeatureView`
  * surfaces its committed version like any managed table). These
  * aggregates are exactly the ones Spark's streaming planner cannot
  * incrementalize from SQL (anchored min-chains, grid forward-fill), so
  * AUTO's fallback would be a FULL recompute per tick — the maintenance
  * declaration is the user saying "I know the exact state, keep it".
  */
sealed trait EventMaintenance
object EventMaintenance {
  /** Anchored funnel over `steps` within `windowUs` (q168/q196 semantics). */
  final case class Funnel(steps: Seq[String], windowUs: Long) extends EventMaintenance
  /** Weekly retention cohorts (q169/q197 semantics). */
  case object Retention extends EventMaintenance
  /** Daily gap-fill / forward-fill (q170/q205 semantics). */
  case object GapFill extends EventMaintenance

  /** Catalog string form: `funnel:<steps ,-joined>:<windowUs>` /
    * `retention` / `gapfill` (colon-free step names enforced at parse
    * symmetry — funnels are event-type vocabularies, never free text).
    */
  def render(m: EventMaintenance): String = m match {
    case Funnel(steps, w) =>
      require(steps.forall(s => !s.contains(":") && !s.contains(",")),
        s"funnel step names must be ':'/','-free: ${steps.mkString(",")}")
      s"funnel:${steps.mkString(",")}:$w"
    case Retention => "retention"
    case GapFill => "gapfill"
  }
  def parse(s: String): EventMaintenance = s.trim match {
    case "retention" => Retention
    case "gapfill" => GapFill
    case f if f.startsWith("funnel:") =>
      val parts = f.split(":", 3)
      require(parts.length == 3, s"bad funnel maintenance spec: $s")
      Funnel(parts(1).split(",").toSeq, parts(2).toLong)
    case other => throw new IllegalArgumentException(
      s"unknown maintenance spec: $other")
  }
}

/** Managed-refresh knobs (reference: feature_view.sql:7-10, README.md:232-235).
  * `refreshFreq` is a duration string like "1 minute" / "5 minutes" / "1 hour"
  * (Snowflake target_lag). `warehouse` is recorded-only in our engine (maps to
  * a scheduler pool on a real cluster). `maintenance` switches the refresh
  * machinery from SQL-plan incrementalization to the named event-analytics
  * maintainer (see [[EventMaintenance]]).
  */
final case class RefreshConfig(
    refreshFreq: String,
    refreshMode: RefreshMode = RefreshMode.Auto,
    initialize: InitializeMode = InitializeMode.OnCreate,
    warehouse: String = "default",
    maintenance: Option[EventMaintenance] = None) {
  def freqMillis: Long = RefreshConfig.parseDurationMillis(refreshFreq)
}

object RefreshConfig {
  /** Parse "1 minute" / "30 seconds" / "2 hours" / "1 day" → millis. */
  def parseDurationMillis(s: String): Long = {
    val parts = s.trim.toLowerCase.split("\\s+")
    require(parts.length == 2, s"bad duration: '$s' (want '<n> <unit>')")
    val n = parts(0).toLong
    parts(1).stripSuffix("s") match {
      case "millisecond" => n
      case "second" => n * 1000L
      case "minute" => n * 60000L
      case "hour" => n * 3600000L
      case "day" => n * 86400000L
      case u => throw new IllegalArgumentException(s"bad duration unit: $u")
    }
  }
}

/** A versioned, named query over sources — the central catalog object.
  * Static (refresh = None) → exposed as a logical view, resolved lazily.
  * Managed (refresh = Some) → materialized table + refresh pipeline.
  * Reference: macros/materializations/feature_view.sql (both branches).
  *
  * `query` is Spark SQL; table names inside it resolve through the session
  * catalog (temp views / other feature views), giving the reference's
  * FV-chaining (ref() → other FV) via ordinary view resolution.
  */
final case class FeatureView(
    name: String,
    entities: Seq[Entity],
    query: String,
    timestampCol: Option[String] = None,
    refresh: Option[RefreshConfig] = None,
    description: String = "") {
  require(name.nonEmpty, "feature view name must be non-empty")
  require(entities.nonEmpty, "feature view requires at least one entity")
  def isManaged: Boolean = refresh.isDefined
  def joinKeys: Seq[String] = entities.flatMap(_.joinKeys).distinct
  /** Logical id `NAME$VERSION` (reference: feature_view.sql:36). */
  def logicalId(version: String): String = s"${name.toUpperCase}$$$version"
  /** Physical identifier safe for Spark catalogs/file paths. */
  def physicalName(version: String): String =
    s"${name.toLowerCase}_v${version.replaceAll("[^A-Za-z0-9]", "_")}"
}

/** A saved training dataset produced by generateDataset (SURVEY §2.B17-19). */
final case class DatasetRef(
    name: String,
    version: String,
    path: String,
    features: Seq[String],     // logical ids NAME$VERSION
    spineTimestampCol: Option[String],
    labelCols: Seq[String],
    description: String = "")
