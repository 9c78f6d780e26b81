package graft.refresh

import java.util.concurrent.{ConcurrentHashMap, Executors, ScheduledFuture, TimeUnit}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.catalog.MetadataCatalog.FeatureViewRecord
import graft.core.FeatureStore
import graft.model._
import graft.storage.VersionedTable

/** Managed-feature-view refresh — the Spark-native realization of Snowflake
  * Dynamic Tables (SURVEY.md §2.C; reference feature_view.sql:116-128:
  * target_lag / refresh_mode / initialize).
  *
  *  - FULL: scheduled batch recompute every `refreshFreq`, published as one
  *    atomic manifest flip ([[graft.storage.VersionedTable.overwrite]]) —
  *    Snowflake's refresh_mode=FULL.
  *  - INCREMENTAL: a Structured Streaming query over a streamable source
  *    directory, sink chosen from the plan shape:
  *      - aggregation with derivable grouping keys → **update** output mode;
  *        each micro-batch carries only the keys whose aggregate changed and
  *        lands as an upsert segment (write cost O(changed keys), read is
  *        merge-on-read with periodic compaction) — the dynamic-table
  *        property on both the input AND the write side;
  *      - no aggregation → **append** output mode; each batch's new rows
  *        land as an append segment (O(batch)) — a batch must never
  *        overwrite the sink, that silently drops all history;
  *      - aggregation whose grouping keys can't be named from the plan →
  *        try the FV's DECLARED entity join keys (+ timestamp col) as the
  *        upsert key (update mode), guarded by a structural check and a
  *        one-time uniqueness dry-run ([[electEntityKeys]]); only if that
  *        fails → **complete** mode, atomic whole-table publish per tick
  *        (write O(result) — the scale cliff the rescue exists to avoid).
  *  - AUTO: try the streaming plan; if Spark's unsupported-operation checker
  *    rejects it (non-incrementalizable query), fall back to FULL — the same
  *    choice Snowflake's AUTO makes.
  *
  * `target_lag` parity: observed staleness at any instant is the tick period
  * PLUS the refresh's own processing time, so ticking every `refreshFreq`
  * overshoots the target by one batch duration (round-6 probe: max 70 s at a
  * 60 s target). Both schedulers therefore tick at 3/4 of the target lag
  * (1 s floor, never above the lag itself — see [[RefreshManager.tickMillis]]),
  * reserving a 25% allowance for batch processing — the same
  * reasoning Snowflake's dynamic-table scheduler applies when it aims
  * refresh completion, not refresh start, at the TARGET_LAG boundary
  * (round-10 matrix: every sink mode × feed scale cell within a 60 s
  * target, `LAGPROBE_r10.json`).
  */
final class RefreshManager(fs: FeatureStore) {
  private val spark: SparkSession = fs.spark
  private val scheduler = Executors.newScheduledThreadPool(2, r => {
    val t = new Thread(r, "graft-refresh"); t.setDaemon(true); t
  })
  private val scheduled = new ConcurrentHashMap[String, ScheduledFuture[_]]()
  private val streams = new ConcurrentHashMap[String, StreamingQuery]()
  private val elected = new ConcurrentHashMap[String, String]()

  /** Output mode the last `startIncremental` elected for this FV
    * ("append" | "update" | "complete") — observability for status
    * surfaces, specs, and the lag probe.
    */
  def electedMode(rec: FeatureViewRecord): Option[String] =
    Option(elected.get(key(rec)))

  private def key(rec: FeatureViewRecord): String = rec.logicalId

  /** One full recompute of a managed FV (refresh_mode=FULL tick, or manual
    * refresh). Publishes the new result as a single manifest flip — a
    * concurrent reader sees either the old committed table or the new one,
    * never a missing or partial table (the old delete→rename swap had both
    * hazards). Dereferenced segments are vacuumed with a retention horizon
    * so in-flight readers keep their files.
    */
  def refreshOnce(rec: FeatureViewRecord): Unit = {
    val path = rec.physicalPath.getOrElse(
      throw new IllegalArgumentException(s"${rec.logicalId} is not a managed feature view"))
    rec.fv.refresh.flatMap(_.maintenance) match {
      case Some(m) =>
        // declared event-analytics maintenance: a FULL tick re-folds the
        // whole event relation — semantically a no-op on already-ingested
        // events (all three maintainers are idempotent merges), so this is
        // always CORRECT, just events-scale; startMaintenanceStream is the
        // O(batch) path
        graft.streaming.EventAnalyticsStream.maintain(
          spark, m, path, spark.sql(rec.fv.query))
      case None =>
        VersionedTable.overwrite(path)(dir =>
          FeatureStore.writeManaged(spark.sql(rec.fv.query), rec.fv, dir))
    }
    VersionedTable.vacuum(path)
  }

  /** The maintained relation a declared-maintenance FV serves — the
    * public read surface next to [[refreshOnce]] (q196/q197/q205's serve
    * through the FV plane).
    */
  def serveMaintained(rec: FeatureViewRecord): DataFrame = {
    val path = rec.physicalPath.getOrElse(
      throw new IllegalArgumentException(s"${rec.logicalId} is not a managed feature view"))
    val m = rec.fv.refresh.flatMap(_.maintenance).getOrElse(
      throw new IllegalArgumentException(s"${rec.logicalId} declares no maintenance"))
    graft.streaming.EventAnalyticsStream.serve(spark, m, path)
  }

  /** INCREMENTAL refresh for a declared-maintenance FV: stream `sourceDir`
    * parquet under temp-view `sourceName`, project each micro-batch
    * through the FV query, and fold it into the FV's state table via the
    * declared maintainer — batchId-guarded (exactly-once despite
    * foreachBatch's at-least-once replay), work per tick
    * O(batch + touched state). The [[startIncremental]] sibling for the
    * aggregates Spark's streaming planner cannot incrementalize from SQL.
    */
  def startMaintenanceStream(
      rec: FeatureViewRecord,
      sourceName: String,
      sourceDir: String,
      sourceSchema: StructType,
      availableNow: Boolean = false,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val path = rec.physicalPath.getOrElse(
      throw new IllegalArgumentException(s"${rec.logicalId} is not a managed feature view"))
    val m = rec.fv.refresh.flatMap(_.maintenance).getOrElse(
      throw new IllegalArgumentException(s"${rec.logicalId} declares no maintenance"))
    val reader = spark.readStream.schema(sourceSchema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(sourceDir)
    val trigger =
      if (availableNow) Trigger.AvailableNow()
      else Trigger.ProcessingTime(RefreshManager.tickMillis(rec.fv.refresh.get.freqMillis))
    elected.put(key(rec), "maintenance")
    val q = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        // bind the batch under the FV query's source name and resolve the
        // query in the BATCH's OWN session: foreachBatch hands a DataFrame
        // bound to the micro-batch's cloned session, so a view registered
        // here lands in that clone's catalog — resolving through the outer
        // session would silently read the view's stale registration-time
        // binding instead of this batch
        batch.createOrReplaceTempView(sourceName)
        graft.streaming.EventAnalyticsStream.maintain(
          spark, m, path, batch.sparkSession.sql(rec.fv.query), Some(bid))
        ()
      }
      .option("checkpointLocation", path + "__checkpoint")
      .trigger(trigger)
      .start()
    Option(streams.put(key(rec), q)).foreach(_.stop())
    q
  }

  /** Start the FULL-mode scheduler: recompute at the target-lag tick. */
  def startFullSchedule(rec: FeatureViewRecord): Unit = {
    val freq = RefreshManager.tickMillis(rec.fv.refresh.get.freqMillis)
    val fut = scheduler.scheduleAtFixedRate(
      () => try refreshOnce(rec) catch { case e: Throwable =>
        System.err.println(s"[refresh] ${rec.logicalId} tick failed: ${e.getMessage}") },
      freq, freq, TimeUnit.MILLISECONDS)
    Option(scheduled.put(key(rec), fut)).foreach(_.cancel(false))
  }

  /** Start INCREMENTAL refresh: stream `sourceDir` parquet under temp-view
    * `sourceName`, run the FV query per micro-batch via foreachBatch, and
    * maintain the sink. Returns the StreamingQuery (caller may
    * `processAllAvailable()` for deterministic tests).
    *
    * `availableNow = true` drains current data and stops (initialize /
    * test path); false runs continuously at the target-lag trigger.
    */
  def startIncremental(
      rec: FeatureViewRecord,
      sourceName: String,
      sourceDir: String,
      sourceSchema: StructType,
      availableNow: Boolean = false,
      pathGlobFilter: Option[String] = None): StreamingQuery = {
    val path = rec.physicalPath.getOrElse(
      throw new IllegalArgumentException(s"${rec.logicalId} is not a managed feature view"))
    val freq = rec.fv.refresh.get.refreshFreq
    // Entity-key rescue needs a BATCH run of the FV query over the current
    // source data (uniqueness dry-run). Lazy thunk: the relation (and its
    // file listing) is only built when the plan-derived key election has
    // actually failed (see electEntityKeys) — the common path pays nothing.
    val batchView = () => scala.util.Try {
      val batchReader = spark.read.schema(sourceSchema)
      pathGlobFilter.foreach(g => batchReader.option("pathGlobFilter", g))
      batchReader.parquet(sourceDir)
    }.toOption
    val reader = spark.readStream.schema(sourceSchema)
    pathGlobFilter.foreach(g => reader.option("pathGlobFilter", g))
    val raw = reader.parquet(sourceDir)
    // C7: bound state for event-time aggregations — watermark the source at
    // the FV's timestamp column with lag = refresh_freq (the sane default
    // SURVEY §2.C7 prescribes; Snowflake DTs handle this internally)
    val stream = rec.fv.timestampCol
      .filter(tc => raw.schema.fields.exists(f =>
        f.name.equalsIgnoreCase(tc) &&
          f.dataType == org.apache.spark.sql.types.TimestampType))
      .map(tc => raw.withWatermark(tc, freq))
      .getOrElse(raw)
    stream.createOrReplaceTempView(sourceName)
    val transformed = spark.sql(rec.fv.query)
    val trigger =
      if (availableNow) Trigger.AvailableNow()
      else Trigger.ProcessingTime(RefreshManager.tickMillis(rec.fv.refresh.get.freqMillis))
    val writeSeg = (batch: DataFrame, dir: String) =>
      FeatureStore.writeManaged(batch, rec.fv, dir)
    // Pick output mode + publish kind from the plan shape (see class doc):
    // update→upsert / append→append / complete→atomic overwrite. Append-mode
    // batches contain ONLY new rows, so they must never overwrite the sink.
    // When the plan can't NAME its grouping keys (expression-grouped), fall
    // back to the FV's DECLARED entity join keys (+ timestamp col) before
    // resorting to complete-mode whole-table publish — the declaration is
    // metadata the plan introspection doesn't have, and it turns an
    // O(result)-per-tick rewrite into an O(changed keys) upsert.
    val isStreamingAgg = transformed.isStreaming && hasAggregate(transformed)
    val aggKeys =
      if (!isStreamingAgg) None
      else groupingKeyNames(transformed)
        .orElse {
          val ks = electEntityKeys(rec, transformed, batchView, sourceName)
          // the dry-run re-bound the source view to batch data; restore the
          // streaming binding for anything that resolves the view later
          stream.createOrReplaceTempView(sourceName)
          ks
        }
    val outMode =
      if (!isStreamingAgg) "append"
      else if (aggKeys.isDefined) "update"
      else "complete"
    elected.put(key(rec), outMode)
    System.err.println(s"[refresh] ${rec.logicalId} output mode = $outMode" +
      aggKeys.map(ks => s" (upsert keys: ${ks.mkString(",")})").getOrElse(""))
    // the micro-batch id rides into the manifest commit: foreachBatch
    // replays the last batch on checkpoint recovery, and the sink skips a
    // batchId it has already committed — exactly-once despite at-least-once
    // delivery (the standard idempotent-sink contract foreachBatch requires)
    val q = transformed.writeStream
      .outputMode(outMode)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        outMode match {
          case "append" =>
            // segment-level event-time stats: one O(batch) agg at write time
            // buys manifest-level data skipping for every later time-range
            // read of this log-shaped table (VersionedTable.readRange)
            val stats = rec.fv.timestampCol
              .filter(tc => batch.schema.fields.exists(f =>
                f.name.equalsIgnoreCase(tc) &&
                  f.dataType == org.apache.spark.sql.types.TimestampType))
              .flatMap(tc => graft.storage.VersionedTable.SegStats.of(batch, tc))
            VersionedTable.append(path, Some(bid), stats)(dir => writeSeg(batch, dir))
            maybeAutoOptimize(rec, path)
          case "update" =>
            VersionedTable.upsert(spark, path, aggKeys.get,
              compactWrite = (merged, dir) => writeSeg(merged, dir),
              batchId = Some(bid))(
              dir => writeSeg(batch, dir))
          case _ =>
            VersionedTable.overwrite(path, Some(bid))(dir => writeSeg(batch, dir))
        }
        VersionedTable.vacuum(path)
        ()
      }
      .option("checkpointLocation", path + "__checkpoint")
      .trigger(trigger)
      .start()
    Option(streams.put(key(rec), q)).foreach(_.stop())
    q
  }

  /** Opportunistic auto-compaction for append-mode sinks — the upsert sink
    * compacts every `compactEvery` commits; append sinks otherwise
    * accumulate one segment per micro-batch forever (the read-amplification
    * cliff `OPTPROBE_r10.json` measures: a 64-segment table scans ~20×
    * slower than its compacted form). After each append commit, if the
    * live segment count has reached `graft.refresh.autoOptimize.segments`
    * (default 64; 0 disables), the table is rewritten into
    * `graft.refresh.autoOptimize.numFiles` files with range-pruning stats
    * refolded. Runs inline on the micro-batch thread — the same trade the
    * upsert compaction makes: one slower tick instead of every read paying
    * the amplification. A concurrent writer winning the CAS just means
    * this tick skips; the next qualifying tick retries.
    */
  private[refresh] def maybeAutoOptimize(
      rec: FeatureViewRecord, path: String): Unit = {
    val threshold = spark.conf.get("graft.refresh.autoOptimize.segments", "64").toInt
    if (threshold <= 0) return
    val segs = VersionedTable.readManifest(path).map(_.segments.size).getOrElse(0)
    if (segs >= threshold) {
      val numFiles = spark.conf.get("graft.refresh.autoOptimize.numFiles", "32").toInt
      try {
        VersionedTable.optimize(spark, path, numFiles, statsCol = rec.fv.timestampCol)
        System.err.println(s"[refresh] ${rec.logicalId} auto-optimized: " +
          s"$segs segments -> 1 ($numFiles files)")
      } catch {
        case _: VersionedTable.ConcurrentCommitException => () // racer won; retry next tick
      }
    }
  }

  private def hasAggregate(df: DataFrame): Boolean =
    df.queryExecution.logical.collectFirst {
      case _: org.apache.spark.sql.catalyst.plans.logical.Aggregate => true
    }.nonEmpty

  /** Output-column names of the topmost aggregate's grouping expressions —
    * the upsert key. None when a grouping expression has no stable output
    * name (the caller then falls back to complete-mode whole-table publish).
    */
  private def groupingKeyNames(df: DataFrame): Option[Seq[String]] = {
    import org.apache.spark.sql.catalyst.expressions.NamedExpression
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val outCols = df.columns.map(_.toLowerCase).toSet
    df.queryExecution.analyzed.collectFirst { case a: Aggregate =>
      val names = a.groupingExpressions.map {
        case ne: NamedExpression => Some(ne.name)
        case other => a.aggregateExpressions.collectFirst {
          case al: org.apache.spark.sql.catalyst.expressions.Alias
            if al.child.semanticEquals(other) => al.name
        }
      }
      if (names.forall(n => n.exists(x => outCols.contains(x.toLowerCase))))
        Some(names.map(_.get))
      else None
    }.flatten
  }

  /** Entity-key fallback for expression-grouped aggregations: when the plan
    * can't name its grouping keys, the FV's declared entity join keys
    * (+ timestamp column for time-series FVs) are still a valid upsert key
    * IF the FV honors its one-row-per-key contract. Two guards, both paid
    * once at stream start (never per tick):
    *   1. structural — the aggregate must have exactly as many grouping
    *      expressions as candidate key columns; a finer grouping (e.g.
    *      user_id, category with entity key user_id) would make upsert
    *      silently drop sibling rows, so it stays complete-mode;
    *   2. empirical — one batch dry-run of the FV query over the CURRENT
    *      source data must show the candidate key is unique. An empty
    *      source trusts the declaration (registration already validated the
    *      key columns exist in the output).
    * Returns the candidate keys in output-column case, or None → complete.
    */
  private def electEntityKeys(
      rec: FeatureViewRecord,
      transformed: DataFrame,
      batchView: () => Option[DataFrame],
      sourceName: String): Option[Seq[String]] = {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.functions.{col, count, lit}
    val candidate = rec.fv.joinKeys ++ rec.fv.timestampCol.toSeq
    val outCols = transformed.columns
    val resolved = candidate.map(k => outCols.find(_.equalsIgnoreCase(k)))
    if (candidate.isEmpty || resolved.exists(_.isEmpty)) return None
    val keys = resolved.map(_.get)
    val nGrouping = transformed.queryExecution.analyzed.collectFirst {
      case a: Aggregate => a.groupingExpressions.size
    }
    if (!nGrouping.contains(keys.size)) return None
    val unique = batchView().forall { bv =>
      // re-bind the source view to batch data for the dry-run, restore after
      bv.createOrReplaceTempView(sourceName)
      try {
        val dups = spark.sql(rec.fv.query)
          .groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
          .filter(col("__n") > 1).limit(1).count()
        dups == 0
      } catch { case _: Throwable => false }
    }
    if (unique) {
      System.err.println(s"[refresh] ${rec.logicalId} grouping keys not " +
        s"derivable from the plan; rescued to update-mode upsert on declared " +
        s"entity keys (${keys.mkString(",")}) after uniqueness dry-run")
      Some(keys)
    } else {
      System.err.println(s"[refresh] ${rec.logicalId} declared keys " +
        s"(${keys.mkString(",")}) are NOT unique in the FV output — " +
        s"complete-mode whole-table publish")
      None
    }
  }

  /** AUTO mode: INCREMENTAL if the plan streams, else FULL schedule —
    * mirrors Snowflake's refresh_mode=AUTO selection.
    */
  def startAuto(
      rec: FeatureViewRecord,
      sourceName: String,
      sourceDir: String,
      sourceSchema: StructType,
      availableNow: Boolean = false,
      pathGlobFilter: Option[String] = None): Either[String, StreamingQuery] = {
    try Right(startIncremental(rec, sourceName, sourceDir, sourceSchema, availableNow, pathGlobFilter))
    catch {
      case e: org.apache.spark.sql.AnalysisException =>
        // non-incrementalizable plan → FULL (silent fallback, logged).
        // startIncremental already swapped in a STREAMING temp view; restore
        // the batch view first so the FULL recompute can .write.
        System.err.println(s"[refresh] ${rec.logicalId} not streamable (${e.getMessage.take(120)}); AUTO → FULL")
        val reader = spark.read
        pathGlobFilter.foreach(g => reader.option("pathGlobFilter", g))
        reader.schema(sourceSchema).parquet(sourceDir).createOrReplaceTempView(sourceName)
        refreshOnce(rec)
        startFullSchedule(rec)
        Left("FULL")
    }
  }

  /** Status of a managed FV's refresh (reference: SHOW DYNAMIC TABLES /
    * describeFeatureView, SURVEY §2.C8).
    */
  def status(rec: FeatureViewRecord): String = {
    val k = key(rec)
    if (streams.containsKey(k)) {
      val q = streams.get(k)
      if (q.isActive) s"INCREMENTAL:active(batch=${Option(q.lastProgress).map(_.batchId).getOrElse(-1L)})"
      else "INCREMENTAL:stopped"
    } else if (scheduled.containsKey(k) && !scheduled.get(k).isCancelled) "FULL:scheduled"
    else "IDLE"
  }

  def stop(rec: FeatureViewRecord): Unit = {
    Option(scheduled.remove(key(rec))).foreach(_.cancel(false))
    Option(streams.remove(key(rec))).foreach(_.stop())
  }

  def stopAll(): Unit = {
    scheduled.values().forEach(f => f.cancel(false)); scheduled.clear()
    streams.values().forEach(q => try q.stop() catch { case _: Throwable => }); streams.clear()
  }
}

object RefreshManager {
  /** Tick period for a target lag: 3/4 of the lag, floored at 1 s but never
    * above the lag itself. The 25% headroom absorbs the refresh's own
    * processing time so that data committed by tick N is at most `lag`
    * stale when tick N+1 commits — without it, worst-case staleness is
    * `lag + batch` (see class doc). Sub-1 s lags tick at the lag itself:
    * below the floor there is no headroom to reserve, and the lag+batch
    * overshoot regime applies (not the contract's target regime — the
    * reference's tested values are minutes to hours).
    */
  private[refresh] def tickMillis(lagMs: Long): Long =
    math.max(math.min(1000L, lagMs), lagMs * 3 / 4)
}
