package graft.functions

import scala.util.Random

import graft.SparkSpec

/** Randomized equivalence for the robots plane: verdicts from the
  * distributed parseRules + isAllowed pipeline must match an independent
  * driver-side reference implementation of RFC 9309 (written against the
  * spec, not against the engine code) over random robots bodies and URLs.
  */
class RobotsFuzzSpec extends SparkSpec {

  private val Ua = "graftbot"

  // ---- driver-side reference (independent spelling of the RFC) ----

  private def refVerdict(robots: Map[String, String], url: String): Boolean = {
    val host = {
      val m = "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)".r
        .findFirstMatchIn(url)
      m.map(_.group(1).toLowerCase).getOrElse("")
    }
    val path = {
      val m = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)".r.findFirstMatchIn(url)
      m.map(_.group(1)).getOrElse("")
    }
    val p = if (path.isEmpty) "/" else path
    val body = robots.getOrElse(host, return true)
    // group parse: consecutive UA lines head a group
    final case class Grp(uas: List[String], rules: List[(Boolean, String)])
    var groups = List.empty[Grp]
    var curUas = List.empty[String]
    var curRules = List.empty[(Boolean, String)]
    var inUaRun = false
    def flush(): Unit = {
      if (curUas.nonEmpty) groups :+= Grp(curUas, curRules)
      curUas = Nil; curRules = Nil
    }
    for (raw <- body.split("\r?\n")) {
      val line = raw.replaceAll("#.*$", "").trim
      val idx = line.indexOf(':')
      if (idx > 0) {
        val k = line.substring(0, idx).trim.toLowerCase
        val v = line.substring(idx + 1).trim
        k match {
          case "user-agent" =>
            if (!inUaRun) { flush(); inUaRun = true }
            curUas :+= v
          case "allow" | "disallow" =>
            inUaRun = false
            if (v.nonEmpty) curRules :+= (k == "allow", v)
          case _ => // unrecognized fields are transparent (RFC 9309 §2.2.4):
          // they neither end a user-agent run nor start a group
        }
      }
    }
    flush()
    val exact = groups.filter(_.uas.exists(_.toLowerCase == Ua))
    val star = groups.filter(_.uas.contains("*"))
    val chosen = if (exact.nonEmpty) exact else star
    val rules = chosen.flatMap(_.rules)
    if (rules.isEmpty) return true
    def matches(pat: String): Boolean = {
      val anchored = pat.endsWith("$")
      val core = if (anchored) pat.dropRight(1) else pat
      val re = core.split("\\*", -1).map(java.util.regex.Pattern.quote).mkString(".*")
      val full = "^" + re + (if (anchored) "$" else ".*")
      p.matches(full)
    }
    val hits = rules.filter { case (_, pat) => matches(pat) }
    if (hits.isEmpty) true
    else {
      val best = hits.maxBy { case (allow, pat) => (pat.length, allow) }
      best._1
    }
  }

  // ---- fuzz ----

  test("random robots bodies and URLs: engine verdicts == RFC reference") {
    import spark.implicits._
    val rnd = new Random(20260814L)
    val hosts = (0 until 6).map(i => s"h$i.fuzz.example")
    val segs = Seq("/a", "/b", "/a/b", "/ab", "/a.x", "/long/deep/path", "/")
    def randomPattern(): String = {
      val base = segs(rnd.nextInt(segs.size))
      val star = if (rnd.nextBoolean()) base.replaceFirst("/([a-z])", "/*") else base
      if (rnd.nextInt(4) == 0) star + "$" else star
    }
    def randomBody(): String = {
      val lines = scala.collection.mutable.ArrayBuffer.empty[String]
      for (_ <- 0 until 1 + rnd.nextInt(3)) {
        val uas = rnd.nextInt(3) match {
          case 0 => Seq(s"User-agent: $Ua")
          case 1 => Seq("User-agent: *")
          case _ => Seq("User-agent: otherbot", "User-agent: " +
            (if (rnd.nextBoolean()) Ua.toUpperCase else "thirdbot"))
        }
        lines ++= uas
        for (_ <- 0 until rnd.nextInt(4)) {
          val kind = if (rnd.nextBoolean()) "Disallow" else "Allow"
          val v = if (rnd.nextInt(8) == 0) "" else randomPattern()
          val comment = if (rnd.nextInt(4) == 0) " # note" else ""
          lines += s"$kind: $v$comment"
        }
        if (rnd.nextInt(3) == 0) lines += "Crawl-delay: 5"
      }
      lines.mkString(if (rnd.nextBoolean()) "\n" else "\r\n")
    }
    for (trial <- 0 until 8) {
      val robots = hosts.take(1 + rnd.nextInt(hosts.size)).map(h => h -> randomBody()).toMap
      val urls = (0 until 60).map { i =>
        val h = hosts(rnd.nextInt(hosts.size)) // some hosts have no robots
        val pth = segs(rnd.nextInt(segs.size)) + (if (rnd.nextBoolean()) s"/x$i" else "")
        (i.toLong, s"https://$h$pth")
      }
      val rules = RobotsFunctions.parseRules(
        robots.toSeq.toDF("host", "body"), "host", "body", Ua)
      val got = RobotsFunctions.isAllowed(
          urls.toDF("id", "url"), "id", "url", rules)
        .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
      urls.foreach { case (id, u) =>
        val want = refVerdict(robots, u)
        assert(got(id) == want,
          s"trial $trial: url $u → engine ${got(id)}, reference $want\nrobots:\n" +
            robots.map { case (h, b) => s"== $h ==\n$b" }.mkString("\n"))
      }
    }
  }
}
