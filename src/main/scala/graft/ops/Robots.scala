package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** robots.txt parsing + URL permission evaluation (RFC 9309) — the
  * politeness gate a web-scale crawl runs on every frontier URL before
  * fetching. From-scratch implementation of the Robots Exclusion
  * Protocol: group selection (a group whose user-agent token matches
  * the crawler beats the `*` group; multiple matching groups merge),
  * `*` wildcards and `$` end anchors in rule paths, and longest-match
  * precedence with allow winning exact-length ties. A host with no
  * robots.txt (or one with no matching rule) allows everything, per
  * the RFC's unavailability semantics.
  *
  * Deliberate simplifications (documented contract): percent-encoding
  * normalization is the caller's job (pair with UrlNorm), and
  * `crawl-delay` is parsed (it is ubiquitous in the wild) though RFC
  * 9309 does not define it.
  *
  * Scale shape: robots bodies live in a per-HOST table (domain
  * cardinality — tiny next to the frontier); `allowedFlags` joins the
  * frontier against it on host, then evaluates in one typed
  * mapPartitions with a per-partition host→parsed-rules memo, so each
  * robots body parses once per (partition, host), not once per URL.
  */
object Robots {

  final case class Rule(allow: Boolean, pattern: String)

  /** Rules + crawl-delay seconds for `ua`, RFC group selection:
    * groups naming `ua` (case-insensitive) win over `*` groups;
    * matching groups merge. */
  def rulesFor(robotsTxt: String, ua: String): (List[Rule], Option[Long]) = {
    final case class Group(uas: List[String], rules: List[Rule],
                           delay: Option[Long])
    val groups = mutable.ListBuffer.empty[Group]
    var curUas = List.empty[String]
    var curRules = List.empty[Rule]
    var curDelay = Option.empty[Long]
    var inUaRun = false
    def flush(): Unit = {
      if (curUas.nonEmpty)
        groups += Group(curUas, curRules.reverse, curDelay)
      curUas = Nil; curRules = Nil; curDelay = None
    }
    for (raw <- robotsTxt.linesIterator) {
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (!inUaRun) { flush(); inUaRun = true }
            curUas = value.toLowerCase(java.util.Locale.ROOT) :: curUas
          case "allow" | "disallow" =>
            inUaRun = false
            // empty value = no rule (historic "Disallow:" allows all);
            // rule paths must start with '/' or a wildcard
            if (value.nonEmpty &&
              (value.startsWith("/") || value.startsWith("*")))
              curRules = Rule(field == "allow", value) :: curRules
          case "crawl-delay" =>
            inUaRun = false
            curDelay = value.toLongOption
          case _ => inUaRun = false
        }
      }
    }
    flush()
    val uaLower = ua.toLowerCase(java.util.Locale.ROOT)
    val specific = groups.filter(_.uas.contains(uaLower)).toList
    val chosen =
      if (specific.nonEmpty) specific
      else groups.filter(_.uas.contains("*")).toList
    (chosen.flatMap(_.rules), chosen.flatMap(_.delay).headOption)
  }

  /** RFC 9309 path-pattern match: `*` spans anything, a trailing `$`
    * anchors the end. Leftmost-greedy segment placement. */
  def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.dropRight(1) else pattern
    val parts = pat.split("\\*", -1)
    if (!path.startsWith(parts(0))) return false
    if (parts.length == 1)
      return if (anchored) path.length == parts(0).length else true
    var pos = parts(0).length
    var i = 1
    while (i < parts.length - 1) {
      val f = path.indexOf(parts(i), pos)
      if (f < 0) return false
      pos = f + parts(i).length
      i += 1
    }
    val last = parts(parts.length - 1)
    if (anchored)
      path.length - last.length >= pos && path.endsWith(last)
    else
      path.indexOf(last, pos) >= 0
  }

  /** Longest-match precedence; allow wins length ties; no match =
    * allowed. */
  def isAllowed(rules: List[Rule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    for (r <- rules if matches(r.pattern, path)) {
      val len = r.pattern.length
      if (len > bestLen || (len == bestLen && r.allow)) {
        bestLen = len
        bestAllow = r.allow
      }
    }
    bestAllow
  }

  /** robots(host, robots_txt) → (host, delay_sec): the crawl-delay
    * RFC-group-selected for `ua`, defaulting when the matched groups
    * carry none. Domain-cardinality output — broadcastable to the
    * scheduler. One typed map. */
  def crawlDelays(robots: DataFrame, hostCol: String,
                  robotsTextCol: String, ua: String,
                  defaultDelay: Long): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots
      .select(col(hostCol).cast("string"),
        col(robotsTextCol).cast("string"))
      .as[(String, String)]
      .map { case (host, txt) =>
        val delay = rulesFor(Option(txt).getOrElse(""), ua)._2
          .getOrElse(defaultDelay)
        (host, delay)
      }
      .toDF("host", "delay_sec")
  }

  /** frontier(host, path) × robots(host, robots_txt) → (host, path,
    * allowed). Missing robots = allowed. One typed mapPartitions with
    * a per-partition parse memo. */
  def allowedFlags(frontier: DataFrame, robots: DataFrame,
                   hostCol: String, pathCol: String,
                   robotsTextCol: String, ua: String): DataFrame = {
    val spark = frontier.sparkSession
    import spark.implicits._
    frontier
      .select(col(hostCol).cast("string").as("host"),
        col(pathCol).cast("string").as("path"))
      .join(robots.select(col(hostCol).cast("string").as("host"),
        col(robotsTextCol).cast("string").as("robots_txt")),
        Seq("host"), "left")
      .as[(String, String, String)]
      .mapPartitions { it =>
        val memo = mutable.HashMap.empty[String, List[Rule]]
        it.map { case (host, path, txt) =>
          val rules =
            if (txt == null) Nil
            else memo.getOrElseUpdate(host, rulesFor(txt, ua)._1)
          (host, path, isAllowed(rules, path))
        }
      }
      .toDF("host", "path", "allowed")
  }

  /** `Sitemap:` URLs from a robots.txt, in file order. Per RFC 9309
    * §2.3 sitemap lines are GLOBAL — independent of any user-agent
    * group, so they're collected from the whole file regardless of
    * position; the field name is case-insensitive, values keep their
    * case (URLs), inline `#` comments are stripped, duplicates kept
    * (file order is the discovery order). */
  def sitemapUrls(robotsTxt: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    for (raw <- Option(robotsTxt).getOrElse("").linesIterator) {
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0 &&
        line.substring(0, colon).trim
          .equalsIgnoreCase("sitemap")) {
        val v = line.substring(colon + 1).trim
        if (v.nonEmpty) out += v
      }
    }
    out.result()
  }

  /** One row per sitemap line: (hostCol, sitemap_idx, sitemap_url) —
    * one typed flatMap over the domain-cardinality robots table. */
  def sitemapRows(robots: DataFrame, hostCol: String,
                  robotsTextCol: String): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col(hostCol).cast("string"),
        col(robotsTextCol).cast("string"))
      .as[(String, String)]
      .flatMap { case (host, txt) =>
        sitemapUrls(txt).zipWithIndex.map { case (u, i) =>
          (host, i.toLong, u)
        }
      }
      .toDF(hostCol, "sitemap_idx", "sitemap_url")
  }
}
