package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt compliance (RFC 9309, the Robots Exclusion Protocol) — the
  * politeness gate a crawl pipeline applies right after URL filtering:
  * fetched-or-not is decided per (host, path) against the host's
  * published rule groups.
  *
  * Supported semantics (the RFC core + the two REP wildcards every major
  * crawler honors):
  *  - groups = consecutive `User-agent` lines + following rules; the
  *    groups matching the crawler's UA exactly (case-insensitive) govern
  *    when any exist, else the `*` groups; a host with neither allows all;
  *  - `Allow`/`Disallow` with literal prefixes, `*` wildcards, and a
  *    trailing `$` anchor; empty rule values are no-ops (RFC: "Disallow:"
  *    alone permits everything);
  *  - decision = most-specific match wins (longest pattern), `Allow`
  *    winning exact ties; no matching rule ⇒ allowed. Comments (`#…`) and
  *    unknown fields are dropped; matching is against the PATH component
  *    (query strings are out of scope here — extend the path expression
  *    if a crawl needs them).
  *
  * Scale shape: group parsing is one explode + host-partitioned window +
  * host aggregation over the ROBOTS corpus (hosts × small files — orders
  * of magnitude below the URL corpus; a once-per-crawl prep step). The
  * verdict join ships the compiled rules to the URL corpus broadcast
  * (rules for even millions of hosts are ~100 MB; pass `hint = false`
  * to fall back to a shuffled join keyed by host, which co-locates each
  * host's URLs with its handful of rules). The per-URL work is map-side
  * regex matching + a (host,id)-grouped max over matched rules — the
  * group is bounded by the host's RULE COUNT, never by corpus size.
  */
object RobotsFunctions {

  /** Compile the governing rule set for `userAgent` out of raw robots.txt
    * bodies: `(hostCol, bodyCol)` → `(host, rule ∈ {allow,disallow},
    * path, pattern, spec_len)` — `pattern` is the anchored regex the
    * matcher uses, `spec_len` the RFC specificity (pattern source
    * length).
    */
  def parseRules(
      robots: DataFrame, hostCol: String, bodyCol: String,
      userAgent: String): DataFrame = {
    require(userAgent.nonEmpty && userAgent == userAgent.toLowerCase,
      s"userAgent must be non-empty lowercase (RFC 9309 matches it case-insensitively), got '$userAgent'")
    val lines = robots
      .select(col(hostCol).as("host"),
        posexplode(split(col(bodyCol), "\r?\n")).as(Seq("pos", "line")))
      .withColumn("line", trim(regexp_replace(col("line"), "#.*$", "")))
      .filter(col("line").contains(":"))
      .withColumn("key", lower(trim(substring_index(col("line"), ":", 1))))
      .withColumn("value",
        trim(expr("substring(line, instr(line, ':') + 1)")))
      .filter(col("key").isin("user-agent", "allow", "disallow"))
    val w = Window.partitionBy(col("host")).orderBy(col("pos"))
    // a group starts at a user-agent line not preceded by another one
    val grouped = lines
      .withColumn("is_ua", col("key") === "user-agent")
      .withColumn("grp_start",
        col("is_ua") && !coalesce(lag(col("is_ua"), 1).over(w), lit(false)))
      .withColumn("grp", sum(col("grp_start").cast("int")).over(w))
      .filter(col("grp") > 0) // rules before any User-agent line are invalid
    val grpInfo = grouped.groupBy(col("host"), col("grp")).agg(
      max(when(col("is_ua") && lower(col("value")) === userAgent, 1)
        .otherwise(0)).as("ua_exact"),
      max(when(col("is_ua") && col("value") === "*", 1).otherwise(0)).as("ua_star"))
    val hostExact = grpInfo.groupBy(col("host"))
      .agg(max(col("ua_exact")).as("host_exact"))
    // RFC: all groups for the chosen UA combine into one rule set
    val chosen = grpInfo.join(hostExact, Seq("host"))
      .filter((col("host_exact") === 1 && col("ua_exact") === 1) ||
        (col("host_exact") === 0 && col("ua_star") === 1))
      .select(col("host"), col("grp"))
    grouped
      .filter(!col("is_ua") && col("value") =!= "")
      .join(chosen, Seq("host", "grp"))
      .select(col("host"), col("key").as("rule"), col("value").as("path"),
        pathPattern(col("value")).as("pattern"),
        length(col("value")).as("spec_len"))
  }

  /** REP path → anchored regex: specials escaped, `*` → `.*`, a TRAILING
    * `$` re-enabled as the end anchor (inner `$` stays literal). Pure
    * string expressions — the compile rides the rules relation, never
    * the URL corpus.
    */
  def pathPattern(path: Column): Column = {
    // escape regex specials EXCEPT '*' (incl. '$' — re-enabled below)
    val esc = regexp_replace(path, "([.\\[\\]{}()+?^|\\\\$])", "\\\\$1")
    val star = regexp_replace(esc, "\\*", ".*")
    // trailing '$': drop its 2-char escaped form and append the anchor
    concat(lit("^"),
      when(path.endsWith("$"),
        concat(substring(star, lit(1), length(star) - 2), lit("$")))
        .otherwise(star))
  }

  /** Politeness verdict per URL: `(idCol, urlCol)` → `(idCol, urlCol,
    * host, allowed)`. `rules` is [[parseRules]] output. Decision is the
    * RFC most-specific-match (longest `spec_len`, `allow` breaking ties);
    * hosts absent from `rules` allow everything. `idCol` must be unique
    * per row (the verdict re-groups by it).
    */
  def isAllowed(
      urls: DataFrame, idCol: String, urlCol: String,
      rules: DataFrame, hint: Boolean = true): DataFrame = {
    val r0 = rules.select(col("host").as("__rhost"),
      (col("rule") === "allow").as("__allow"),
      col("spec_len").as("__len"), col("pattern").as("__re"))
    val r = if (hint) broadcast(r0) else r0
    val u = urls
      .withColumn("host", UrlFunctions.urlHost(col(urlCol)))
      .withColumn("__path",
        when(UrlFunctions.urlPath(col(urlCol)) === "", lit("/"))
          .otherwise(UrlFunctions.urlPath(col(urlCol))))
    u.join(r, col("host") === col("__rhost"), "left")
      .withColumn("__match",
        col("__re").isNotNull && regexp_like(col("__path"), col("__re")))
      .groupBy(col(idCol), col(urlCol), col("host"))
      .agg(max(when(col("__match"),
        struct(col("__len"), col("__allow").as("allow")))).as("__best"))
      .withColumn("allowed", coalesce(col("__best").getField("allow"), lit(true)))
      .select(col(idCol), col(urlCol), col("host"), col("allowed"))
  }
}
