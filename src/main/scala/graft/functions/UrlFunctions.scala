package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain filtering — the C4-style gate that runs BEFORE everything
  * else in a crawl pipeline: scheme allowlist, host extraction, and a
  * domain blocklist anti-join decide which fetched pages even enter
  * main-text extraction.
  *
  * Parsing is regex-based (codegen'd `regexp_extract`, zero UDFs) with
  * RE2-compatible patterns shared verbatim by the cross-engine oracles —
  * deliberately NOT `java.net.URI` semantics, whose exception-driven
  * edge-cases (spaces, brackets, bare percent signs — all common in crawl
  * URLs) are both slow and impossible to restate portably.
  *
  * Scale shape: everything here is map-side; the blocklist join is a
  * broadcast LEFT ANTI on the registered domain (a blocklist of even a
  * few million domains is tens of MB — comfortably broadcastable; for a
  * larger one, drop to a shuffled anti-join by passing `hint = false`).
  */
object UrlFunctions {

  /** RE2-compatible patterns (no lookaround/backrefs), single-sourced for
    * engine and oracle.
    */
  val SchemePattern = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  val HostPattern = "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)"
  val PathPattern = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)"

  def urlScheme(u: Column): Column = lower(regexp_extract(u, SchemePattern, 1))

  /** Hostname, lowercased; userinfo and port stripped. Empty string when
    * `u` is not an absolute URL.
    */
  def urlHost(u: Column): Column = lower(regexp_extract(u, HostPattern, 1))

  /** Path component (no query/fragment); empty for bare-host URLs. */
  def urlPath(u: Column): Column = regexp_extract(u, PathPattern, 1)

  /** Last-two-labels approximation of the registrable domain
    * (`cdn.ads.example.com` → `example.com`). A public-suffix-list pass
    * would treat `example.co.uk` as registrable — this approximation
    * groups by `co.uk` instead, which for a BLOCKLIST is the conservative
    * direction (blocking a two-label suffix blocks its subdomains' whole
    * family). Wire a PSL table through `blockedDomains` itself when exact
    * registrability matters.
    */
  def registeredDomain(host: Column): Column =
    when(host.rlike("\\."), regexp_extract(host, "([^.]+\\.[^.]+)$", 1))
      .otherwise(host)

  /** Final DNS label (`example.org` → `org`); empty for dotless hosts. */
  def urlTld(host: Column): Column = regexp_extract(host, "\\.([A-Za-z0-9-]+)$", 1)

  /** Query-parameter names stripped by [[normalizeUrl]] — tracking noise
    * that splinters one logical page into many crawl URLs.
    */
  val TrackingParamPattern = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref_src)="

  /** Canonical URL form — the URL-level dedup key a crawl pipeline groups
    * on before fetching or after (same page, many spellings):
    * scheme/host lowercased, userinfo and fragment dropped, default ports
    * (http:80, https:443) dropped, empty path → `/`, tracking query
    * params ([[TrackingParamPattern]]) removed and the rest SORTED (query
    * order is almost never semantic; the collision risk is the accepted
    * trade every crawler makes). Non-absolute URLs come back unchanged —
    * refusing to guess. Pure string expressions, zero shuffle.
    */
  def normalizeUrl(u: Column): Column = {
    val scheme = urlScheme(u)
    val auth = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val hostPort = regexp_extract(auth, "^(?:[^@]*@)?(.*)$", 1)
    val host = lower(regexp_extract(hostPort, "^([^:]*)", 1))
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val path0 = urlPath(u)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val q = regexp_extract(u, "^[^#?]*\\?([^#]*)", 1)
    val params = filter(split(q, "&"),
      p => length(p) > 0 && !p.rlike(TrackingParamPattern))
    val qs = array_join(array_sort(params), "&")
    when(scheme === "" || host === "", u).otherwise(concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs))))
  }

  /** The front-door filter: keep rows whose `urlCol` has an allowlisted
    * scheme, a non-empty host, and a registered domain NOT in
    * `blockedDomains` (single column `domain`). Appends `scheme`, `host`,
    * `domain` columns to the survivors. `hint = false` drops the
    * broadcast hint for blocklists too big to ship to every executor.
    */
  def filterUrls(
      df: DataFrame, urlCol: String, blockedDomains: DataFrame,
      allowedSchemes: Seq[String] = Seq("http", "https"),
      hint: Boolean = true): DataFrame = {
    require(allowedSchemes.nonEmpty, "allowedSchemes must be non-empty")
    require(blockedDomains.columns.toSeq == Seq("domain"),
      s"blockedDomains needs exactly one column 'domain', " +
        s"got ${blockedDomains.columns.mkString(",")}")
    val u = col(urlCol)
    val withParts = df
      .withColumn("scheme", urlScheme(u))
      .withColumn("host", urlHost(u))
      .withColumn("domain", registeredDomain(col("host")))
      .filter(col("scheme").isin(allowedSchemes.map(_.toLowerCase): _*) &&
        col("host") =!= "")
    val block = if (hint) broadcast(blockedDomains) else blockedDomains
    withParts.join(block, Seq("domain"), "left_anti")
  }

  /** Convenience: literal blocklist. */
  def filterUrls(df: DataFrame, urlCol: String,
      blockedDomains: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    filterUrls(df, urlCol,
      blockedDomains.toDF("domain").select(lower(col("domain")).as("domain")))
  }
}
