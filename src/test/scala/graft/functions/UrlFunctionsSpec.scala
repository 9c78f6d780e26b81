package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlFunctionsSpec extends SparkSpec {
  import UrlFunctions._

  private def parts(url: String): (String, String, String, String, String) = {
    import spark.implicits._
    val r = Seq(url).toDF("u")
      .select(urlScheme(col("u")), urlHost(col("u")), urlPath(col("u")),
        registeredDomain(urlHost(col("u"))), urlTld(urlHost(col("u"))))
      .head()
    (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getString(4))
  }

  test("scheme/host/path/domain/tld parse the common shapes") {
    assert(parts("https://www.Example.COM/a/b?q=1#f") ==
      ("https", "www.example.com", "/a/b", "example.com", "com"))
    assert(parts("http://user:pw@site.org:8080/x") ==
      ("http", "site.org", "/x", "site.org", "org"))
    assert(parts("ftp://files.big.example.net") ==
      ("ftp", "files.big.example.net", "", "example.net", "net"))
    // dotless host: registered domain falls back to the host itself
    assert(parts("http://localhost/admin") ==
      ("http", "localhost", "/admin", "localhost", ""))
    // not an absolute URL → everything empty
    assert(parts("not a url at all") == ("", "", "", "", ""))
    assert(parts("/relative/path") == ("", "", "", "", ""))
  }

  test("filterUrls keeps allowlisted schemes and non-blocked domains only") {
    import spark.implicits._
    val df = Seq(
      1L -> "https://news.example.com/a",
      2L -> "http://cdn.ads.io/t.gif",          // blocked domain
      3L -> "ftp://files.example.com/b",        // scheme
      4L -> "https://deep.sub.badsite.net/x",   // blocked via registered domain
      5L -> "mailto:someone",                   // no host
      6L -> "HTTPS://UPPER.EXAMPLE.ORG/c"       // case-normalized
    ).toDF("id", "url")
    val kept = filterUrls(df, "url", Seq("badsite.net", "ADS.io"))
      .select("id", "scheme", "host", "domain")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._1)
    assert(kept.map(_._1).toSeq == Seq(1L, 6L))
    assert(kept(1) == ((6L, "https", "upper.example.org", "example.org")))
  }

  test("filterUrls without the broadcast hint produces the same survivors") {
    import spark.implicits._
    val df = (0L until 50L).map(i =>
      (i, s"https://h$i.example${i % 3}.com/p")).toDF("id", "url")
    val blocked = Seq("example0.com").toDF("domain")
    val a = filterUrls(df, "url", blocked, hint = true).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = filterUrls(df, "url", blocked, hint = false).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b && a.size == 33)
    assert(a.forall(_ % 3 != 0))
  }

  test("filterUrls refuses a malformed blocklist relation") {
    import spark.implicits._
    val df = Seq(1L -> "https://a.b/c").toDF("id", "url")
    val bad = Seq(("x", 1)).toDF("domain", "extra")
    assert(intercept[IllegalArgumentException](
      filterUrls(df, "url", bad)).getMessage.contains("domain"))
  }

  test("normalizeUrl canonicalizes case, ports, fragments, tracking params, and query order") {
    import spark.implicits._
    def n(url: String): String =
      Seq(url).toDF("u").select(normalizeUrl(col("u"))).head().getString(0)
    assert(n("HTTPS://User:pw@Example.COM:443/A/B?b=2&a=1#frag") ==
      "https://example.com/A/B?a=1&b=2")             // path case preserved
    assert(n("http://site.org:80/") == "http://site.org/")
    assert(n("http://site.org:8080/x") == "http://site.org:8080/x") // non-default port kept
    assert(n("https://site.org") == "https://site.org/")            // empty path → /
    assert(n("https://s.org/p?utm_source=x&utm_medium=y&fbclid=z") == "https://s.org/p")
    assert(n("https://s.org/p?gclid=1&real=2") == "https://s.org/p?real=2")
    assert(n("ftp://Files.Org:21/d") == "ftp://files.org:21/d")     // only http/https defaults drop
    assert(n("not a url") == "not a url")                           // non-absolute: unchanged
  }

  test("the blocklist anti-join broadcasts (plan shape)") {
    import spark.implicits._
    val df = Seq(1L -> "https://a.example.com/x").toDF("id", "url")
    val plan = filterUrls(df, "url", Seq("bad.com"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
  }
}
