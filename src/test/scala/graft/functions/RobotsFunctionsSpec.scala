package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobotsFunctionsSpec extends SparkSpec {
  import RobotsFunctions._

  private def verdicts(robots: Seq[(String, String)],
      urls: Seq[(Long, String)], ua: String = "graftbot"): Map[Long, Boolean] = {
    import spark.implicits._
    val rules = parseRules(robots.toDF("host", "body"), "host", "body", ua)
    isAllowed(urls.toDF("id", "url"), "id", "url", rules)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
  }

  test("group selection: exact-UA groups shadow the catch-all entirely") {
    val robots = Seq("h.com" ->
      """User-agent: GraftBot
        |Disallow: /private
        |User-agent: *
        |Disallow: /""".stripMargin)
    val v = verdicts(robots, Seq(
      1L -> "http://h.com/public/page",
      2L -> "http://h.com/private/page"))
    assert(v(1L) && !v(2L)) // the * group's Disallow / must NOT apply
  }

  test("multiple User-agent lines head one shared group; UA match is case-insensitive") {
    val robots = Seq("h.com" ->
      """User-agent: alphabot
        |User-agent: GRAFTBOT
        |Disallow: /x
        |""".stripMargin)
    val v = verdicts(robots, Seq(1L -> "http://h.com/x/1", 2L -> "http://h.com/y"))
    assert(!v(1L) && v(2L))
  }

  test("all matching groups combine into one rule set (RFC 9309 §2.2.1)") {
    val robots = Seq("h.com" ->
      """User-agent: graftbot
        |Disallow: /a
        |User-agent: other
        |Disallow: /b
        |User-agent: graftbot
        |Disallow: /c""".stripMargin)
    val v = verdicts(robots, Seq(
      1L -> "http://h.com/a", 2L -> "http://h.com/b", 3L -> "http://h.com/c"))
    assert(!v(1L) && v(2L) && !v(3L))
  }

  test("longest match wins; allow breaks exact-length ties") {
    val robots = Seq("h.com" ->
      """User-agent: *
        |Disallow: /shop
        |Allow: /shop/sale
        |Disallow: /tie
        |Allow: /tie""".stripMargin)
    val v = verdicts(robots, Seq(
      1L -> "http://h.com/shop/cart",
      2L -> "http://h.com/shop/sale/item",
      3L -> "http://h.com/tie/page"))
    assert(!v(1L)) // /shop (4) beats nothing
    assert(v(2L))  // /shop/sale (10) beats /shop (5)
    assert(v(3L))  // equal length 4/4 → allow wins
  }

  test("wildcards and $ anchors match like the REP examples") {
    val robots = Seq("h.com" ->
      """User-agent: *
        |Disallow: /*.pdf$
        |Disallow: /tmp*box""".stripMargin)
    val v = verdicts(robots, Seq(
      1L -> "http://h.com/docs/a.pdf",       // $ anchor fires
      2L -> "http://h.com/docs/a.pdfx",      // past the anchor → allowed
      3L -> "http://h.com/tmp/deep/box",     // * spans segments
      4L -> "http://h.com/tmpbox",           // * matches empty
      5L -> "http://h.com/box/tmp"))         // prefix-anchored: no match
    assert(!v(1L) && v(2L) && !v(3L) && !v(4L) && v(5L))
  }

  test("regex specials in rule paths stay literal") {
    val robots = Seq("h.com" ->
      """User-agent: *
        |Disallow: /a.b(c)+""".stripMargin)
    val v = verdicts(robots, Seq(
      1L -> "http://h.com/a.b(c)+x", // literal match
      2L -> "http://h.com/aXb(c)+"))  // '.' must not match 'X'
    assert(!v(1L) && v(2L))
  }

  test("comments, empty values, unknown fields, CRLF, and missing robots default-allow") {
    val robots = Seq("h.com" ->
      "User-agent: * # who\r\nCrawl-delay: 10\r\nDisallow: /x # why\r\nDisallow:\r\n")
    val v = verdicts(robots, Seq(
      1L -> "http://h.com/x/1",
      2L -> "http://h.com/y",        // empty Disallow is a no-op, not /
      3L -> "http://norobots.com/z", // host without robots → allowed
      4L -> "http://h.com"))         // bare host → path "/"
    assert(!v(1L) && v(2L) && v(3L) && v(4L))
  }

  test("rules before any User-agent line are dropped as invalid") {
    val robots = Seq("h.com" -> "Disallow: /\nUser-agent: *\nDisallow: /only")
    val v = verdicts(robots, Seq(1L -> "http://h.com/other", 2L -> "http://h.com/only/x"))
    assert(v(1L) && !v(2L))
  }

  test("verdict join without the broadcast hint agrees with the hinted plan") {
    import spark.implicits._
    val robots = Seq("h.com" -> "User-agent: *\nDisallow: /x").toDF("host", "body")
    val rules = parseRules(robots, "host", "body", "graftbot")
    val urls = (0L until 40L).map(i =>
      (i, s"http://h.com/${if (i % 2 == 0) "x" else "y"}/$i")).toDF("id", "url")
    val a = isAllowed(urls, "id", "url", rules, hint = true)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val b = isAllowed(urls, "id", "url", rules, hint = false)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(a == b)
    assert((0L until 40L).forall(i => a(i) == (i % 2 == 1)))
  }
}
