package graft.catalog

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.model._

object MetadataCatalog {
  /** Stored FV record: definition + version + plan hash + physical location.
    * `objectType` is the reference's marker-tag value:
    * MANAGED_FEATURE_VIEW | EXTERNAL_FEATURE_VIEW (feature_view.sql:78).
    */
  final case class FeatureViewRecord(
      fv: FeatureView,
      version: String,
      planHash: String,
      physicalPath: Option[String],
      objectType: String) {
    def logicalId: String = fv.logicalId(version)
  }
}

/** File-backed metadata catalog — the Spark-native replacement for the
  * reference's Snowflake TAG subsystem (SURVEY.md §1.1: tags
  * SNOWML_FEATURE_STORE_OBJECT / SNOWML_FEATURE_VIEW_METADATA /
  * SNOWML_FEATURE_STORE_ENTITY_*; reference feature_view.sql:59-97).
  *
  * One JSON document per catalog object, written atomically
  * (tmp-file + ATOMIC_MOVE). Entities are stored in the object form
  * `[{"name": ..., "joinKeys": [...]}]` — the canonical resolution of the
  * reference's string-vs-object metadata ambiguity (SURVEY §1.1 note;
  * reference scripts/cleanup_old_metadata.py:70-85 treats strings as the
  * old/bad format).
  *
  * Scale note: catalog metadata is O(#objects), never O(data) — driver-side
  * file I/O only; no Spark jobs. On a shared cluster this directory would sit
  * on DBFS/S3/HDFS; the per-object-file layout keeps writes atomic without a
  * transaction log.
  */
final class MetadataCatalog(val root: String) {
  private val mapper = new ObjectMapper()

  private def dir(kind: String): Path = Paths.get(root, kind)
  private def objPath(kind: String, key: String): Path = dir(kind).resolve(s"$key.json")

  def init(): Unit =
    Seq("entities", "feature_views", "datasets", "data").foreach(k => Files.createDirectories(dir(k)))

  def isInitialized: Boolean = Files.isDirectory(dir("entities"))

  // ---- low-level json helpers -------------------------------------------

  private def writeAtomic(p: Path, node: JsonNode): Unit = {
    Files.createDirectories(p.getParent)
    val tmp = p.getParent.resolve(p.getFileName.toString + ".tmp")
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def read(p: Path): Option[JsonNode] =
    if (Files.exists(p)) Some(mapper.readTree(Files.readAllBytes(p))) else None

  // directory-stream handles must be closed — refresh ticks call these on
  // every micro-batch, so an unclosed Files.list leaks fds over a long run
  private def listJsonPaths(d: Path): Seq[Path] =
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val s = Files.list(d)
      try s.iterator().asScala.filter(_.toString.endsWith(".json")).toSeq.sortBy(_.toString)
      finally s.close()
    }

  private def list(kind: String): Seq[JsonNode] =
    listJsonPaths(dir(kind)).flatMap(read)

  // ---- entities ----------------------------------------------------------

  def putEntity(e: Entity): Unit = {
    val c = e.canonical
    val n = mapper.createObjectNode()
    n.put("name", c.name)
    val keys = n.putArray("joinKeys"); c.joinKeys.foreach(keys.add)
    n.put("description", c.description)
    writeAtomic(objPath("entities", c.name), n)
  }

  def getEntity(name: String): Option[Entity] =
    read(objPath("entities", name.toUpperCase)).map(nodeToEntity)

  def listEntities(): Seq[Entity] =
    list("entities").flatMap(n => scala.util.Try(nodeToEntity(n)).toOption)

  def dropEntity(name: String): Boolean = Files.deleteIfExists(objPath("entities", name.toUpperCase))

  private def nodeToEntity(n: JsonNode): Entity = Entity(
    n.get("name").asText(),
    n.get("joinKeys").elements().asScala.map(_.asText()).toSeq,
    Option(n.get("description")).map(_.asText()).getOrElse(""))

  // ---- feature views -----------------------------------------------------
  import MetadataCatalog.FeatureViewRecord

  private def fvKey(name: String, version: String): String =
    s"${name.toUpperCase}__${version.replaceAll("[^A-Za-z0-9.]", "_")}"

  def putFeatureView(rec: FeatureViewRecord): Unit = {
    val fv = rec.fv
    val n = mapper.createObjectNode()
    n.put("name", fv.name.toUpperCase)
    n.put("version", rec.version)
    // type marker, as the reference's SNOWML_FEATURE_STORE_OBJECT tag
    n.put("objectType", rec.objectType)
    n.put("pkgVersion", "1.0.0")
    val ents = n.putArray("entities")
    fv.entities.map(_.canonical).foreach { e =>
      val en = ents.addObject()
      en.put("name", e.name)
      val jk = en.putArray("joinKeys"); e.joinKeys.foreach(jk.add)
    }
    // reference stores the literal string "NULL" for a missing ts col
    // (feature_view.sql:74); we use a real null.
    fv.timestampCol match {
      case Some(c) => n.put("timestampCol", c.toUpperCase)
      case None => n.putNull("timestampCol")
    }
    n.put("query", fv.query)
    n.put("description", fv.description)
    n.put("planHash", rec.planHash)
    rec.physicalPath match {
      case Some(p) => n.put("physicalPath", p)
      case None => n.putNull("physicalPath")
    }
    fv.refresh match {
      case Some(r) =>
        val rn = n.putObject("refresh")
        rn.put("refreshFreq", r.refreshFreq)
        rn.put("refreshMode", RefreshMode.render(r.refreshMode))
        rn.put("initialize", InitializeMode.render(r.initialize))
        rn.put("warehouse", r.warehouse)
        r.maintenance.foreach(m => rn.put("maintenance", EventMaintenance.render(m)))
      case None => n.putNull("refresh")
    }
    writeAtomic(objPath("feature_views", fvKey(fv.name, rec.version)), n)
  }

  def getFeatureView(name: String, version: String): Option[FeatureViewRecord] =
    read(objPath("feature_views", fvKey(name, version))).map(nodeToFvRecord)

  /** Valid records only; malformed files are surfaced by
    * [[invalidFeatureViewFiles]] for the cleanup op (reference
    * scripts/cleanup_old_metadata.py semantics: skip+report, don't crash).
    */
  def listFeatureViews(): Seq[FeatureViewRecord] =
    list("feature_views").flatMap(n => scala.util.Try(nodeToFvRecord(n)).toOption)

  /** Metadata files that fail to parse/validate (old or corrupt format). */
  def invalidFeatureViewFiles(): Seq[Path] =
    listJsonPaths(dir("feature_views"))
      .filter(p => read(p).forall(n => scala.util.Try(nodeToFvRecord(n)).isFailure))

  def dropFeatureView(name: String, version: String): Boolean =
    Files.deleteIfExists(objPath("feature_views", fvKey(name, version)))

  /** Raw stored metadata per FV as (logicalId, json text) — the engine's
    * equivalent of reading the SNOWML_FEATURE_VIEW_METADATA tag values
    * (reference test_feature_view_metadata_structure.sql:5-13), for
    * DataFrame-level introspection via from_json/explode.
    */
  def rawFeatureViewJson(): Seq[(String, String)] =
    listJsonPaths(dir("feature_views"))
      .flatMap { p =>
        val text = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        scala.util.Try {
          val n = mapper.readTree(text)
          (s"${n.get("name").asText()}$$${n.get("version").asText()}", text)
        }.toOption
      }

  private def nodeToFvRecord(n: JsonNode): FeatureViewRecord = {
    val entities = n.get("entities").elements().asScala.map { en =>
      Entity(
        en.get("name").asText(),
        en.get("joinKeys").elements().asScala.map(_.asText()).toSeq)
    }.toSeq
    val refresh = Option(n.get("refresh")).filter(!_.isNull).map { rn =>
      RefreshConfig(
        rn.get("refreshFreq").asText(),
        RefreshMode.parse(rn.get("refreshMode").asText()),
        InitializeMode.parse(rn.get("initialize").asText()),
        rn.get("warehouse").asText(),
        Option(rn.get("maintenance")).filter(!_.isNull)
          .map(m => EventMaintenance.parse(m.asText())))
    }
    val ts = Option(n.get("timestampCol")).filter(!_.isNull).map(_.asText())
      .filter(_ != "NULL")
    val fv = FeatureView(
      n.get("name").asText(),
      entities,
      n.get("query").asText(),
      ts,
      refresh,
      Option(n.get("description")).map(_.asText()).getOrElse(""))
    FeatureViewRecord(
      fv,
      n.get("version").asText(),
      n.get("planHash").asText(),
      Option(n.get("physicalPath")).filter(!_.isNull).map(_.asText()),
      n.get("objectType").asText())
  }

  // ---- datasets ----------------------------------------------------------

  def putDataset(d: DatasetRef): Unit = {
    val n = mapper.createObjectNode()
    n.put("name", d.name.toUpperCase)
    n.put("version", d.version)
    n.put("path", d.path)
    val fs = n.putArray("features"); d.features.foreach(fs.add)
    d.spineTimestampCol match {
      case Some(c) => n.put("spineTimestampCol", c)
      case None => n.putNull("spineTimestampCol")
    }
    val ls = n.putArray("labelCols"); d.labelCols.foreach(ls.add)
    n.put("description", d.description)
    writeAtomic(objPath("datasets", fvKey(d.name, d.version)), n)
  }

  def getDataset(name: String, version: String): Option[DatasetRef] =
    read(objPath("datasets", fvKey(name, version))).map(nodeToDataset)

  def listDatasets(): Seq[DatasetRef] = list("datasets").map(nodeToDataset)

  private def nodeToDataset(n: JsonNode): DatasetRef = DatasetRef(
    n.get("name").asText(),
    n.get("version").asText(),
    n.get("path").asText(),
    n.get("features").elements().asScala.map(_.asText()).toSeq,
    Option(n.get("spineTimestampCol")).filter(!_.isNull).map(_.asText()),
    n.get("labelCols").elements().asScala.map(_.asText()).toSeq,
    Option(n.get("description")).map(_.asText()).getOrElse(""))

  /** Data directory for materialized objects (managed FVs, datasets). */
  def dataPath(physicalName: String): String =
    dir("data").resolve(physicalName).toString
}
