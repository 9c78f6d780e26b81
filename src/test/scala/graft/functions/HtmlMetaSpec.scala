package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlMetaSpec extends SparkSpec {
  import TextFunctions._

  private def meta(html: String): (String, String, String, String) = {
    import spark.implicits._
    val r = Seq(html).toDF("h")
      .select(htmlTitle(col("h")), htmlMeta(col("h"), "description"),
        htmlLang(col("h")), htmlCanonical(col("h")))
      .head()
    (r.getString(0), r.getString(1), r.getString(2), r.getString(3))
  }

  test("title normalizes whitespace; attributes parse in either order") {
    val html =
      """<html LANG='EN-us'><head>
        |<title> Page
        |   One </title>
        |<meta content="a page" name="description">
        |<link href="https://c.org/x" rel="canonical">
        |</head><body></body></html>""".stripMargin
    assert(meta(html) == (("Page One", "a page", "en-us", "https://c.org/x")))
  }

  test("name-first meta and rel-first canonical parse too; case-insensitive names") {
    val html = "<html lang=\"fr\"><head><title>T</title>" +
      "<meta name='Description' content='autre page'>" +
      "<link rel='canonical' href='https://c.org/y'></head></html>"
    assert(meta(html) == (("T", "autre page", "fr", "https://c.org/y")))
  }

  test("absent fields come back empty, never null") {
    assert(meta("<html><body><p>no head</p></body></html>") == (("", "", "", "")))
  }

  test("unrelated meta/link tags don't bleed into the extracted fields") {
    val html = "<html lang='de'><head><title>Z</title>" +
      "<meta name='keywords' content='k1,k2'>" +
      "<meta name='description' content='real one'>" +
      "<link rel='stylesheet' href='/style.css'>" +
      "<link rel='canonical' href='https://c.org/z'></head></html>"
    assert(meta(html) == (("Z", "real one", "de", "https://c.org/z")))
  }
}
