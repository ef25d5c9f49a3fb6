package graft.crawl

/**
 * robots.txt handling (north rule: "per-host politeness buckets with
 * robots.txt-derived crawl-delay"). The reference's only politeness is a
 * fixed 300 ms sleep (wordpress/mod.rs:146); here every host serves a
 * deterministic synthetic robots.txt whose Crawl-delay feeds the
 * politeness clock and whose Disallow rules filter the frontier.
 */
object Robots {

  final case class Rules(host: String, crawl_delay_ms: Int, disallow: Seq[String])

  /**
   * Parse the `User-agent: *` group of a robots.txt body: Crawl-delay
   * (seconds, fractional allowed) and Disallow path prefixes (empty
   * Disallow = allow all). Unknown directives are ignored.
   */
  def parse(host: String, body: String, defaultDelayMs: Int = 300): Rules = {
    var inStar = false
    var delayMs = defaultDelayMs
    val disallow = scala.collection.mutable.ArrayBuffer.empty[String]
    body.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val idx = line.indexOf(':')
      if (idx > 0) {
        val key = line.substring(0, idx).trim.toLowerCase
        val value = line.substring(idx + 1).trim
        key match {
          case "user-agent" => inStar = value == "*"
          case "crawl-delay" if inStar =>
            value.toDoubleOption.foreach(d => delayMs = (d * 1000).toInt)
          case "disallow" if inStar && value.nonEmpty => disallow += value
          case _ =>
        }
      }
    }
    Rules(host, delayMs, disallow.toSeq)
  }

  /** Deterministic synthetic robots.txt per host (the fetch fixture). */
  def syntheticBody(site: Site): String =
    s"""# robots.txt for ${site.host}
       |User-agent: *
       |Crawl-delay: ${site.crawl_delay_ms / 1000.0}
       |Disallow: /private/
       |Disallow: /admin
       |
       |User-agent: BadBot
       |Disallow: /
       |""".stripMargin

  /** Parsed rules for the whole fleet (host-level: max delay wins when
    * several sites share a host, mirroring the shared politeness bucket). */
  def fleetRules: Seq[Rules] =
    Sites.all.groupBy(_.host).map { case (host, ss) =>
      val parsed = ss.map(s => parse(host, syntheticBody(s)))
      Rules(host, parsed.map(_.crawl_delay_ms).max,
        parsed.flatMap(_.disallow).distinct.sorted)
    }.toSeq

  /** Is a URL path allowed under the host's Disallow prefixes? */
  def allowed(path: String, disallow: Seq[String]): Boolean =
    path == null || !disallow.exists(d => path.startsWith(d))
}
