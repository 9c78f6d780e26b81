package graft.core

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.Tables
import graft.model._

/** Admin-plane semantics: describeFeatureView readback (A10/C8) and the
  * invalid-metadata cleanup op (A11, reference cleanup_old_metadata.py).
  */
class AdminOpsSpec extends SparkSpec {

  private def freshStore(): FeatureStore =
    FeatureStore(spark, Files.createTempDirectory("graft_admin_test_").toString)

  test("describeFeatureView reads back identity + refresh config") {
    val fs = freshStore()
    Tables.events(spark, sfDir).createOrReplaceTempView("admin_ev")
    fs.registerEntity(Entity("user", Seq("user_id")))
    fs.registerFeatureView(FeatureView(
      "fv_desc", Seq(Entity("user", Seq("user_id"))),
      "SELECT user_id, count(*) AS f_n FROM admin_ev GROUP BY user_id",
      refresh = Some(RefreshConfig("5 minutes", RefreshMode.Full, InitializeMode.OnSchedule, "whx"))), "3.1")
    val row = fs.describeFeatureView("fv_desc", "3.1").collect()(0)
    assert(row.getAs[String]("logical_id") == "FV_DESC$3.1")
    assert(row.getAs[String]("object_type") == "MANAGED_FEATURE_VIEW")
    assert(row.getAs[String]("refresh_freq") == "5 minutes")
    assert(row.getAs[String]("initialize") == "ON_SCHEDULE")
    assert(row.getAs[String]("warehouse") == "whx")
    // ON_SCHEDULE ⇒ not materialized at registration
    assert(!row.getAs[Boolean]("is_materialized"))
  }

  test("refreshFeatureView(full = true) force-rebuilds regardless of plan-hash state") {
    val fs = freshStore()
    Tables.events(spark, sfDir).limit(100).createOrReplaceTempView("admin_force_ev")
    fs.registerEntity(Entity("user", Seq("user_id")))
    val fv = FeatureView(
      "fv_force", Seq(Entity("user", Seq("user_id"))),
      "SELECT user_id, count(*) AS f_n FROM admin_force_ev GROUP BY user_id",
      refresh = Some(RefreshConfig("1 minute")))
    fs.registerFeatureView(fv, "1")
    val path = fs.getFeatureView("fv_force", "1").physicalPath.get
    // re-registering the unchanged view is a NoOp — that's A5 behavior, and
    // exactly why a user needs an explicit force op
    assert(fs.registerFeatureView(fv, "1") == FeatureStore.NoOp)
    // a plain refresh tick advances the manifest version
    fs.refreshFeatureView("fv_force", "1")
    val vAfterTick = graft.storage.VersionedTable.readManifest(path).get.version
    assert(vAfterTick == 2, s"refresh tick should commit on top of history, got $vAfterTick")
    assert(fs.describeFeatureView("fv_force", "1").collect()(0)
      .getAs[Long]("table_version") == 2L)
    // the forced rebuild discards table + checkpoint state: fresh manifest v1
    fs.refreshFeatureView("fv_force", "1", full = true)
    val m = graft.storage.VersionedTable.readManifest(path).get
    assert(m.version == 1 && m.segments.size == 1,
      s"full=true must rebuild from scratch, got $m")
    assert(fs.readFeatureView("fv_force", "1").count() > 0)
    assert(fs.describeFeatureView("fv_force", "1").collect()(0)
      .getAs[Long]("table_version") == 1L)
  }

  test("readFeatureView time-travels a managed FV across refresh commits") {
    val fs = freshStore()
    Tables.events(spark, sfDir).limit(100).createOrReplaceTempView("admin_tt_ev")
    fs.registerEntity(Entity("user", Seq("user_id")))
    fs.registerFeatureView(FeatureView(
      "fv_tt", Seq(Entity("user", Seq("user_id"))),
      "SELECT user_id, count(*) AS f_n FROM admin_tt_ev GROUP BY user_id",
      refresh = Some(RefreshConfig("1 minute"))), "1")
    val v1Rows = fs.readFeatureView("fv_tt", "1").count()
    // the source grows, a refresh tick republishes
    Tables.events(spark, sfDir).limit(300).createOrReplaceTempView("admin_tt_ev")
    fs.refreshFeatureView("fv_tt", "1")
    assert(fs.readFeatureView("fv_tt", "1", asOfTableVersion = Some(1L)).count() == v1Rows)
    assert(fs.readFeatureView("fv_tt", "1").agg(org.apache.spark.sql.functions.sum("f_n"))
      .collect()(0).getLong(0) == 300)
    // static FVs have no history
    fs.registerFeatureView(FeatureView(
      "fv_tt_static", Seq(Entity("user", Seq("user_id"))),
      "SELECT user_id, count(*) AS f_n FROM admin_tt_ev GROUP BY user_id"), "1")
    intercept[IllegalArgumentException](
      fs.readFeatureView("fv_tt_static", "1", asOfTableVersion = Some(1L)))
  }

  test("refreshFeatureView on a static (external) feature view is refused") {
    val fs = freshStore()
    Tables.events(spark, sfDir).createOrReplaceTempView("admin_static_ev")
    fs.registerEntity(Entity("user", Seq("user_id")))
    fs.registerFeatureView(FeatureView(
      "fv_static", Seq(Entity("user", Seq("user_id"))),
      "SELECT user_id, count(*) AS f_n FROM admin_static_ev GROUP BY user_id"), "1")
    val e = intercept[IllegalArgumentException](fs.refreshFeatureView("fv_static", "1"))
    assert(e.getMessage.contains("not a managed feature view"))
  }

  test("dropFeatureView removes record, view, and materialized data") {
    val fs = freshStore()
    Tables.events(spark, sfDir).createOrReplaceTempView("admin_ev")
    fs.registerEntity(Entity("user", Seq("user_id")))
    fs.registerFeatureView(FeatureView(
      "fv_dropme", Seq(Entity("user", Seq("user_id"))),
      "SELECT user_id, count(*) AS f_n FROM admin_ev GROUP BY user_id",
      refresh = Some(RefreshConfig("1 minute"))), "1")
    val path = fs.getFeatureView("fv_dropme", "1").physicalPath.get
    assert(new java.io.File(path).exists())
    assert(fs.dropFeatureView("fv_dropme", "1"))
    assert(!new java.io.File(path).exists())
    assert(fs.catalog.getFeatureView("fv_dropme", "1").isEmpty)
    assert(!fs.dropFeatureView("fv_dropme", "1"))  // idempotent-ish: already gone
  }

  test("catalog metadata files use the object entity form (UI-parser contract)") {
    // the reference's test_metadata_compatibility UI simulation: entities
    // must be [{name, joinKeys}] objects, never plain strings
    val fs = freshStore()
    Tables.events(spark, sfDir).createOrReplaceTempView("admin_ev")
    fs.registerEntity(Entity("user", Seq("user_id")))
    fs.registerFeatureView(FeatureView(
      "fv_meta", Seq(Entity("user", Seq("user_id"))),
      "SELECT user_id, count(*) AS f_n FROM admin_ev GROUP BY user_id"), "1")
    val json = new String(java.nio.file.Files.readAllBytes(
      Paths.get(fs.catalog.root, "feature_views", "FV_META__1.json")), "UTF-8")
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val ent = node.get("entities").get(0)
    assert(ent.isObject, "entities must be objects, not strings")
    assert(ent.get("name").asText() == "USER")
    assert(ent.get("joinKeys").get(0).asText() == "USER_ID")
    assert(node.get("objectType").asText() == "EXTERNAL_FEATURE_VIEW")
    assert(node.get("pkgVersion").asText() == "1.0.0")
  }

  test("cleanupInvalidMetadata drops corrupt records, keeps valid ones") {
    val fs = freshStore()
    Tables.events(spark, sfDir).createOrReplaceTempView("admin_ev")
    fs.registerEntity(Entity("user", Seq("user_id")))
    fs.registerFeatureView(FeatureView(
      "fv_good", Seq(Entity("user", Seq("user_id"))),
      "SELECT user_id, count(*) AS f_n FROM admin_ev GROUP BY user_id"), "1")
    // plant an old/corrupt-format record (entities as plain strings — the
    // reference's OLD/BAD format per cleanup_old_metadata.py:70-85)
    Files.writeString(
      Paths.get(fs.catalog.root, "feature_views", "FV_OLD__1.json"),
      """{"name": "FV_OLD", "version": "1", "objectType": "EXTERNAL_FEATURE_VIEW",
        | "entities": ["USER"], "timestampCol": null, "query": "SELECT 1",
        | "planHash": "x", "physicalPath": null, "refresh": null}""".stripMargin)
    assert(fs.catalog.invalidFeatureViewFiles().nonEmpty)
    val dropped = fs.cleanupInvalidMetadata()
    assert(dropped == Seq("FV_OLD__1.json"))
    assert(fs.catalog.invalidFeatureViewFiles().isEmpty)
    assert(fs.catalog.listFeatureViews().map(_.fv.name) == Seq("FV_GOOD"))
  }
}
