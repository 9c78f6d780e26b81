package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Feature-monitoring plane: column profiling and train/serve drift — the
  * operational layer every production feature store runs next to its
  * materializations (reference anchor: the feature-view lifecycle; drift
  * monitoring is the standard companion, cf. PSI from credit-scoring
  * practice and the Evidently/TFDV formulations).
  *
  * Scale shape: everything here is one map-side-combined aggregation per
  * table — profiles and histograms are mergeable per-partition state, so
  * the shuffle carries per-column/per-bucket partials, never rows.
  */
object Monitoring {

  /** Per-column profile over numeric (long/double-castable) columns: one
    * output row per column with exact counts and exact-decimal mean
    * (order-independent — the cross-engine aggregate lesson). ONE scan:
    * all columns' statistics run as a single aggregation (Spark plans the
    * multiple distinct aggregates via expand), then pivot to rows. Shape:
    * (col_name, n_rows, n_nulls, n_distinct, min_v, max_v, mean_v).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c).cast("double")).as(s"${c}__min"),
        max(col(c).cast("double")).as(s"${c}__max"),
        TextFunctions.round4(
          sum(col(c).cast(DecimalType(28, 6))).cast("double") / count(col(c)))
          .as(s"${c}__mean"))
    }
    // ONE action; the per-column rows are then literals (a union of
    // selects over the agg frame would re-run the scan per branch —
    // DataFrame union branches don't share subplans)
    val r = df.agg(count(lit(1)).as("__n"), aggs: _*).head
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("col_name", StringType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("n_nulls", LongType, nullable = false),
      StructField("n_distinct", LongType, nullable = false),
      StructField("min_v", DoubleType), StructField("max_v", DoubleType),
      StructField("mean_v", DoubleType)))
    val rows = cols.map { c =>
      Row(c, r.getAs[Long]("__n"), r.getAs[Long](s"${c}__nulls"),
        r.getAs[Long](s"${c}__distinct"),
        r.getAs[java.lang.Double](s"${c}__min"),
        r.getAs[java.lang.Double](s"${c}__max"),
        r.getAs[java.lang.Double](s"${c}__mean"))
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
  }

  /** Fixed-width histogram bucket index for `c` over [minV, maxV] —
    * map-side, edge values clamped into the end buckets. Boundary math is
    * plain IEEE double (boundaries are a modeling choice on double-valued
    * features; what must stay exact — and does — is the integer COUNT per
    * bucket, and the op sequence matches the DuckDB oracle bit-for-bit).
    */
  def bucketOf(c: Column, minV: Double, maxV: Double, nBuckets: Int): Column = {
    val span = math.max(java.lang.Math.ulp(0.0), maxV - minV)
    // doubles here are values, not row counts: bucket boundaries are a
    // modeling choice; the COUNTS per bucket stay exact integers
    val raw = floor((c.cast("double") - lit(minV)) / lit(span) * lit(nBuckets)).cast("long")
    greatest(lit(0L), least(raw, lit(nBuckets.toLong - 1)))
  }

  /** Per-bucket counts of `valueCol` for each split in `splitCol` — the
    * exact, oracle-checkable drift evidence (one agg; mergeable).
    */
  def driftHistogram(
      df: DataFrame, splitCol: String, valueCol: String,
      minV: Double, maxV: Double, nBuckets: Int): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(splitCol).as("split"),
        bucketOf(col(valueCol), minV, maxV, nBuckets).as("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Kolmogorov–Smirnov drift statistic between two splits over the same
    * fixed bucket grid: max over buckets of |CDF_base − CDF_cmp|. Unlike
    * [[psi]] it needs no smoothing (empty buckets contribute their exact
    * cumulative mass) and is plain arithmetic on exact counts, so the
    * result is oracle-checkable. One aggregation + a buckets-sized window.
    */
  def ksDrift(
      df: DataFrame, splitCol: String, baseSplit: String, compareSplit: String,
      valueCol: String, minV: Double, maxV: Double, nBuckets: Int): DataFrame = {
    val hist = driftHistogram(df, splitCol, valueCol, minV, maxV, nBuckets)
      .groupBy(col("bucket"))
      .agg(
        sum(when(col("split") === baseSplit, col("n")).otherwise(0L)).as("n_base"),
        sum(when(col("split") === compareSplit, col("n")).otherwise(0L)).as("n_cmp"))
    // nBuckets rows total — the single-partition windows are deliberate
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // Zero-total guard: an empty split would otherwise divide to NULL and
    // downstream alerting silently skips. Convention: both splits empty →
    // identical (degenerate) distributions, ks = 0; exactly one empty →
    // maximal separation, ks = 1.
    hist
      .select(
        (sum(col("n_base")).over(w)).as("cum_base"),
        (sum(col("n_cmp")).over(w)).as("cum_cmp"),
        (sum(col("n_base")).over(Window.partitionBy())).as("tot_base"),
        (sum(col("n_cmp")).over(Window.partitionBy())).as("tot_cmp"))
      .select(abs(
        when(col("tot_base") > 0, col("cum_base").cast("double") / col("tot_base"))
          - when(col("tot_cmp") > 0, col("cum_cmp").cast("double") / col("tot_cmp")))
        .as("gap"),
        col("tot_base"), col("tot_cmp"))
      .agg(TextFunctions.round4(max(col("gap"))).as("__ks0"),
        coalesce(max(col("tot_base")), lit(0L)).as("__tb"),
        coalesce(max(col("tot_cmp")), lit(0L)).as("__tc"))
      .select(lit(valueCol).as("column"), lit(baseSplit).as("base"),
        lit(compareSplit).as("compare"),
        when(col("__tb") > 0 && col("__tc") > 0, col("__ks0"))
          .when(col("__tb") === 0 && col("__tc") === 0, lit(0.0))
          .otherwise(lit(1.0)).as("ks"))
  }

  /** Population Stability Index between two splits of `valueCol`:
    * PSI = Σ_buckets (p_b − q_b) · ln(p_b / q_b), with Laplace smoothing so
    * empty buckets stay finite. One aggregation + a buckets-sized reduce.
    * Conventional reading: < 0.1 stable, 0.1–0.25 moderate shift, > 0.25
    * action required.
    */
  def psi(
      df: DataFrame, splitCol: String, baseSplit: String, compareSplit: String,
      valueCol: String, minV: Double, maxV: Double, nBuckets: Int): DataFrame = {
    val spark = df.sparkSession
    val observed = driftHistogram(df, splitCol, valueCol, minV, maxV, nBuckets)
      .groupBy(col("bucket"))
      .agg(
        sum(when(col("split") === baseSplit, col("n")).otherwise(0L)).as("n_base"),
        sum(when(col("split") === compareSplit, col("n")).otherwise(0L)).as("n_cmp"))
    // the Σ runs over ALL nBuckets: buckets empty in BOTH splits still
    // contribute a (smoothed) term whenever the split totals differ
    val hist = spark.range(nBuckets).select(col("id").as("bucket"))
      .join(observed, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cmp"), lit(0L)).as("n_cmp"))
    // split totals via whole-frame windows over the nBuckets-sized frame
    // (the ksDrift pattern) — one lazy plan, no driver action, no persist
    val wAll = Window.partitionBy()
    val nb = sum(col("n_base")).over(wAll).cast("double")
    val nc = sum(col("n_cmp")).over(wAll).cast("double")
    val eps = 1.0 // Laplace count smoothing per bucket
    val p = (col("n_base") + lit(eps)) / (nb + lit(eps * nBuckets))
    val q = (col("n_cmp") + lit(eps)) / (nc + lit(eps * nBuckets))
    hist.select(((p - q) * log(p / q)).as("__term"))
      .agg(TextFunctions.round4(sum(col("__term"))).as("psi"))
      .select(lit(valueCol).as("column"), lit(baseSplit).as("base"),
        lit(compareSplit).as("compare"), col("psi"))
  }

  /** Class-balance census per key group with EXACT Gini impurity — the
    * label-skew monitor for training sets (a source whose lang/label
    * distribution collapses is a data bug): gini_ppm = (n² − Σc²)·10⁶
    * div n² — one exact rational, no per-class division truncation and
    * no entropy logs; majority share in ppm rides along. One map-side
    * class count + a keys-scale fold.
    */
  def classBalance(df: DataFrame, label: Column,
      keyNames: Seq[String]): DataFrame = {
    val keys = keyNames.map(col)
    val counts = df.select((keys :+ label.as("__l")): _*)
      .filter(col("__l").isNotNull)
      .groupBy((keys :+ col("__l")): _*).agg(count(lit(1)).as("c"))
    counts.groupBy(keys: _*)
      .agg(sum(col("c")).as("n"),
        count(lit(1)).as("n_classes"),
        sum(col("c") * col("c")).as("sum_c2"),
        max(col("c")).as("c_max"))
      .select((keys :+ col("n") :+ col("n_classes") :+
        expr("cast(((n * n - sum_c2) * 1000000) div (n * n) as bigint)")
          .as("gini_ppm") :+
        expr("cast((c_max * 1000000) div n as bigint)").as("majority_ppm")): _*)
  }

  /** Exact-integer correlation census per key group — Pearson r² as a
    * RATIO OF EXACT INTEGERS: with the classic integer moments
    * S = n·Σxy − Σx·Σy, Sxx = n·Σx² − (Σx)², Syy = n·Σy² − (Σy)²,
    * r² = S²/(Sxx·Syy) — emitted as `corr_sq_ppm = S²·10⁶ div (Sxx·Syy)`
    * plus `corr_sign` (the sign of S), so the correlation strength and
    * direction are bit-reproducible with NO sqrt and NO floats anywhere.
    * Inputs must be integer columns the caller scales so per-row products
    * fit a long (the moments promote to DECIMAL(38,0) for the final
    * arithmetic). One map-side-combined aggregation; constant columns
    * (zero variance) emit NULL ppm rather than dividing by zero.
    */
  def corrCensus(df: DataFrame, x: Column, y: Column,
      keyNames: Seq[String]): DataFrame = {
    val keys = keyNames.map(col)
    val agg = df.select((keys :+ x.as("__x") :+ y.as("__y")): _*)
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
        sum(col("__x") * col("__y")).as("sxy"),
        sum(col("__x") * col("__x")).as("sxx"),
        sum(col("__y") * col("__y")).as("syy"))
    def dd(c: String) = s"cast($c as decimal(38,0))"
    agg.select((keys :+ col("n") :+
      expr(s"${dd("n")} * ${dd("sxy")} - ${dd("sx")} * ${dd("sy")}").as("s_xy") :+
      expr(s"${dd("n")} * ${dd("sxx")} - ${dd("sx")} * ${dd("sx")}").as("s_xx") :+
      expr(s"${dd("n")} * ${dd("syy")} - ${dd("sy")} * ${dd("sy")}").as("s_yy")): _*)
      .select((keys :+ col("n") :+
        col("s_xy").cast("long").as("s_xy") :+
        col("s_xx").cast("long").as("s_xx") :+
        col("s_yy").cast("long").as("s_yy") :+
        // ppm in DECIMAL(38,0) BEFORE any long cast: S² ≈ 10³⁰-scale.
        // Loud overflow gate (ADVICE r14): S²·10⁶ exceeds DECIMAL(38,0)
        // once |S| passes ~10¹⁶, and non-ANSI Spark would return a silent
        // NULL indistinguishable from the zero-variance NULL — so any
        // moment past the exactness bound fails the job instead. By
        // Cauchy-Schwarz s_xy² ≤ s_xx·s_yy, so gating the two variance
        // moments bounds all three.
        when(greatest(abs(col("s_xx")), abs(col("s_yy"))) >
            expr("cast('10000000000000000' as decimal(38,0))"),
          raise_error(concat(lit("corrCensus: centered moment exceeds the " +
            "DECIMAL(38,0) exactness bound 1e16 (s_xx="), col("s_xx"),
            lit(", s_yy="), col("s_yy"),
            lit(") — rescale the inputs before the census"))).cast("long"))
          .when(col("s_xx") =!= 0 && col("s_yy") =!= 0,
            expr("cast((s_xy * s_xy * cast(1000000 as decimal(38,0))) " +
              "div (s_xx * s_yy) as bigint)"))
          .as("corr_sq_ppm") :+
        signum(col("s_xy")).cast("long").as("corr_sign")): _*)
  }

  /** MAD-based robust outlier census per key group — the data-quality
    * screen that survives the outliers it hunts (mean/stddev don't):
    * median and MAD (median absolute deviation) via
    * [[FeatureEncoding.exactPercentiles]]'s by-value integer machinery,
    * outlier ⟺ |v − med| > (k_tenths/10)·MAD, stated in integers as
    * `10·|v − med| > k_tenths·MAD`. Two percentile passes over
    * per-(key, value) count tables + one final census — no floats, no
    * approx_percentile nondeterminism. Returns one row per key:
    * `(keys…, n_rows, med, mad, n_outliers, out_min, out_max)`.
    */
  def robustOutliers(df: DataFrame, valueInt: Column, keyNames: Seq[String],
      kTenths: Long = 30L): DataFrame = {
    val keys = keyNames.map(col)
    val v = df.select((keys :+ valueInt.as("v")): _*).filter(col("v").isNotNull)
    val med = FeatureEncoding.exactPercentiles(v, col("v"), keyNames, Seq(500))
      .select((keys :+ col("value").as("med")): _*)
    val withMed = v.join(med, keyNames)
      .withColumn("dev", abs(col("v") - col("med")))
    val mad = FeatureEncoding.exactPercentiles(withMed, col("dev"), keyNames, Seq(500))
      .select((keys :+ col("value").as("mad")): _*)
    withMed.join(mad, keyNames)
      .withColumn("is_out", col("dev") * 10 > lit(kTenths) * col("mad"))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_rows"),
        min(col("med")).as("med"), min(col("mad")).as("mad"),
        sum(col("is_out").cast("long")).as("n_outliers"),
        min(when(col("is_out"), col("v"))).as("out_min"),
        max(when(col("is_out"), col("v"))).as("out_max"))
  }

  /** One data-contract rule: `name` labels it in the census, `predicate`
    * is the per-row PASS condition (dbt-test semantics: `not_null`,
    * `accepted_values`, range checks — any row-local Column). Uniqueness
    * is row-GLOBAL and has its own constructor.
    */
  case class Expectation(name: String, predicate: Column)

  object Expectation {
    def notNull(c: String): Expectation =
      Expectation(s"not_null($c)", col(c).isNotNull)
    def acceptedValues(c: String, values: Seq[String]): Expectation =
      Expectation(s"accepted_values($c)", col(c).isin(values: _*))
    def inRange(c: String, lo: Long, hi: Long): Expectation =
      Expectation(s"range($c,$lo,$hi)", col(c) >= lo && col(c) <= hi)
  }

  /** Data-contract validation — the dbt test surface (the reference ships
    * its feature views with dbt's not_null/unique/accepted_values tests;
    * this is that check plane as an ENGINE op a pipeline runs on every
    * ingest wave): one row per rule with `n_rows`, `n_fail`, and `passed`.
    *
    * Row-local rules evaluate in ONE scan as conditional aggregates (the
    * census unpivots from a 1×R aggregate row, the q168 shape);
    * `uniqueCols` adds one map-side-combined groupBy per key set, whose
    * shuffle carries only key counts. `failFast = true` throws naming
    * every violated rule — the refuse-loudly ingest gate.
    */
  def expectations(df: DataFrame, rules: Seq[Expectation],
      uniqueCols: Seq[String] = Nil, failFast: Boolean = false): DataFrame = {
    require(rules.nonEmpty || uniqueCols.nonEmpty, "no expectations given")
    val rowAggs = rules.flatMap { r =>
      Seq(count(lit(1)).as(s"__n_${r.name}"),
        coalesce(sum(when(!coalesce(r.predicate, lit(false)), 1L).otherwise(0L)),
          lit(0L)).as(s"__f_${r.name}"))
    }
    val rowCensus: Option[DataFrame] = if (rules.isEmpty) None else {
      val one = df.agg(rowAggs.head, rowAggs.tail: _*)
      val structs = rules.map(r => struct(lit(r.name).as("rule"),
        col(s"__n_${r.name}").as("n_rows"), col(s"__f_${r.name}").as("n_fail")))
      Some(one.select(explode(array(structs: _*)).as("e")).select(col("e.*")))
    }
    val uniqueCensus: Option[DataFrame] = if (uniqueCols.isEmpty) None else {
      val dupes = df.groupBy(uniqueCols.map(col): _*)
        .agg(count(lit(1)).as("__c"))
        .agg(coalesce(sum(col("__c")), lit(0L)).as("n_rows"),
          coalesce(sum(when(col("__c") > 1, col("__c"))).cast("long"), lit(0L))
            .as("n_fail"))
      Some(dupes.select(
        lit(s"unique(${uniqueCols.mkString(",")})").as("rule"),
        col("n_rows"), col("n_fail")))
    }
    val census = (rowCensus.toSeq ++ uniqueCensus.toSeq).reduce(_ unionByName _)
      .withColumn("passed", col("n_fail") === 0L)
    if (failFast) {
      val bad = census.filter(!col("passed"))
        .select(col("rule"), col("n_fail")).collect()
      require(bad.isEmpty, "expectations violated: " +
        bad.map(r => s"${r.getString(0)} (${r.getLong(1)} rows)").mkString("; "))
    }
    census
  }
}
