package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSpec {
  import TextFunctions._

  private def extractOne(html: String,
      minTokens: Int = 5, maxLinkPct: Int = 30,
      stopwords: Seq[String] = Nil, minStopPct: Int = 0): String = {
    import spark.implicits._
    Seq(html).toDF("h")
      .select(extractMainText(col("h"), minTokens, maxLinkPct, stopwords, minStopPct).as("m"))
      .head().getString(0)
  }

  test("keeps the long content block, drops nav/footer/short blocks") {
    val html =
      """<html><head><title>T</title><style>p{x:1}</style></head><body>
        |<div><a href="/">Home</a> <a href="/a">About</a></div>
        |<h1>Big News</h1>
        |<p>this is the real article body with plenty of words in it</p>
        |<footer><a href="/t">Terms</a> <a href="/p">Privacy</a></footer>
        |</body></html>""".stripMargin
    assert(extractOne(html) ==
      "this is the real article body with plenty of words in it")
  }

  test("link-dense long blocks are dropped by the integer link-density rule") {
    // 7 tokens (passes minTokens) but almost all chars are anchor text
    val linky = "<div><a href='/1'>one two three four five six</a> x</div>" +
      "<p>clean body text with several plain words here</p>"
    assert(extractOne(linky) == "clean body text with several plain words here")
    // raising maxLinkPct to 100 keeps both
    assert(extractOne(linky, maxLinkPct = 100) ==
      "one two three four five six x clean body text with several plain words here")
  }

  test("stopword rule drops function-word-free blocks when enabled") {
    val html = "<p>alpha beta gamma delta epsilon zeta</p>" +
      "<p>the cat sat on the mat and the dog ran</p>"
    val sw = defaultStopwords
    // without the rule both blocks are long enough
    assert(extractOne(html).startsWith("alpha beta"))
    // with a 20% stopword floor only the English-like block survives
    assert(extractOne(html, stopwords = sw, minStopPct = 20) ==
      "the cat sat on the mat and the dog ran")
  }

  test("script/style/comment content never leaks into blocks") {
    val html = "<script>var boilerplate = 'one two three four five six';</script>" +
      "<style>body { margin: one two three four five; }</style>" +
      "<!-- comment with one two three four five six words -->" +
      "<p>actual visible words for the main content here</p>"
    assert(extractOne(html) == "actual visible words for the main content here")
  }

  test("inline tags are stripped inside kept blocks; whitespace normalizes") {
    val html = "<p>words with   <b>bold</b> and\n <i>italic</i> spans inside them</p>"
    assert(extractOne(html) == "words with bold and italic spans inside them")
  }

  test("nested anchors count their plain chars once; attributes don't count") {
    // anchor with inline markup inside: link chars = normalized anchor text
    val html = "<div>some filler words here <a href='/very/long/href/path'>go <b>now</b></a></div>"
    // plain = "some filler words here go now" (29 chars), link = "go now" (6)
    // 6*100 = 600 <= 29*30 = 870 → kept
    assert(extractOne(html) == "some filler words here go now")
  }

  test("empty and tag-only documents extract to empty") {
    assert(extractOne("") == "")
    assert(extractOne("<html><body><div></div></body></html>") == "")
    assert(extractOne("<p>too few words</p>") == "")
  }

  test("multiple kept blocks join in document order") {
    val html = "<p>first block has exactly six words</p><div>junk</div>" +
      "<p>second block also carries another six words</p>"
    assert(extractOne(html) ==
      "first block has exactly six words second block also carries another six words")
  }
}
