package graft.sinks

import java.sql.Timestamp
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextKernel
import graft.model.{CalendarEvent, Post}

/**
 * Output sinks — faithful re-expressions of the reference emitters:
 *  - RSS 2.0 per site (packages/ssufid/src/core/rss.rs:13-101);
 *  - ICS VCALENDAR (packages/ssufid/src/core/ics.rs:7-90);
 *  - per-site JSON (cli/src/main.rs:202-213);
 *  - JSON-lines crawl report (cli/src/main.rs:300-340).
 *
 * Formatting is pure Scala over already-shaped rows; the Spark side
 * aggregates each site's posts with ONE shuffle (groupByKey + mapGroups,
 * ordered inside the group) and writes one file per site via
 * partitionBy(site_id) — at fleet scale sites are independent partitions.
 */
object Rss {

  private val Rfc2822 =
    DateTimeFormatter.ofPattern("EEE, dd MMM yyyy HH:mm:ss Z", java.util.Locale.US)
      .withZone(ZoneOffset.UTC)
  private val Rfc3339 = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
    .withZone(ZoneOffset.UTC)

  def pubDate(ts: Timestamp): String = Rfc2822.format(Instant.ofEpochMilli(ts.getTime))
  def atomUpdated(ts: Timestamp): String = Rfc3339.format(Instant.ofEpochMilli(ts.getTime))

  /** Description with the 50-char content-prefix fallback (rss.rs:17-22). */
  def description(post: Post): String =
    post.description.getOrElse(TextKernel.descriptionFallback(post.content))

  /** Thumbnail enclosure MIME with the reference's image default (rss.rs:52-55). */
  def enclosureMime(thumbnailUrl: String): String =
    Option(TextKernel.mimeGuess(thumbnailUrl)).getOrElse("image/*")

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def cdata(s: String): String = "<![CDATA[" + s.replace("]]>", "]]]]><![CDATA[>") + "]]>"

  /** One RSS <item> (field semantics mirror rss.rs:13-80, fixture-tested). */
  def itemXml(post: Post): String = {
    val sb = new StringBuilder("<item>")
    sb.append(s"<title>${esc(post.title)}</title>")
    sb.append(s"<link>${esc(post.url)}</link>")
    sb.append(s"<pubDate>${pubDate(post.created_at)}</pubDate>")
    sb.append(s"""<guid isPermaLink="false">${esc(post.id)}</guid>""")
    sb.append(s"<description>${esc(description(post))}</description>")
    sb.append(s"<content:encoded>${cdata(post.content)}</content:encoded>")
    post.author.foreach(a => sb.append(s"<author>${esc(a)}</author>"))
    post.category.foreach(c => sb.append(s"<category>${esc(c)}</category>"))
    post.thumbnail.foreach { t =>
      sb.append(s"""<enclosure url="${esc(t)}" length="0" type="${enclosureMime(t)}"/>""")
    }
    post.updated_at.foreach(u => sb.append(s"<atom:updated>${atomUpdated(u)}</atom:updated>"))
    sb.append("</item>")
    sb.toString
  }

  /** Whole channel (rss.rs:84-101): posts must already be output-ordered. */
  def channelXml(title: String, source: String, desc: String, posts: Seq[Post]): String = {
    val sb = new StringBuilder(
      """<?xml version="1.0" encoding="utf-8"?>""" +
        """<rss version="2.0" xmlns:atom="http://www.w3.org/2005/Atom"""" +
        """ xmlns:content="http://purl.org/rss/1.0/modules/content/"><channel>""")
    sb.append(s"<title>${esc(title)}</title>")
    sb.append(s"<link>${esc(source)}</link>")
    sb.append(s"<description>${esc(desc)}</description>")
    posts.foreach(p => sb.append(itemXml(p)))
    sb.append("</channel></rss>")
    sb.toString
  }

  /**
   * Per-site RSS feeds: one (site_id, xml) row per site. Input must carry
   * a `rank` column (merge insertion order); items are emitted
   * newest-first (top-K semantics applied upstream).
   */
  def perSite(posts: DataFrame): DataFrame = {
    val spark = posts.sparkSession
    import spark.implicits._
    val ranked = posts.orderBy(col("site_id"), col("rank").desc)
    ranked.select(col("site_id"), col("rank"), to_json(struct(
      posts.columns.filter(_ != "rank").map(col): _*)).as("post_json"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .mapGroups { (site: String, rows: Iterator[(String, Long, String)]) =>
        val posts = rows.toSeq.sortBy(-_._2).map(r => SiteJson.postFromJson(r._3))
        (site, channelXml(site, s"https://$site", s"$site notices", posts))
      }
      .toDF("site_id", "rss_xml")
  }
}

object Ics {

  private val IcsDt = DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")
    .withZone(ZoneOffset.UTC)

  def icsDatetime(ts: Timestamp): String = IcsDt.format(Instant.ofEpochMilli(ts.getTime))

  def eventLines(e: CalendarEvent): Seq[String] = {
    val base = Seq(
      "BEGIN:VEVENT",
      s"UID:${e.id}",
      s"SUMMARY:${TextKernel.icsEscape(e.title)}",
      s"DTSTAMP:${icsDatetime(e.starts_at)}",
      s"DTSTART:${icsDatetime(e.starts_at)}") ++
      e.description.map(d => s"DESCRIPTION:${TextKernel.icsEscape(d)}") ++
      e.ends_at.map(t => s"DTEND:${icsDatetime(t)}") ++
      e.location.map(l => s"LOCATION:${TextKernel.icsEscape(l)}") ++
      e.url.map(u => s"URL:$u")
    base :+ "END:VEVENT"
  }

  /** Full VCALENDAR (ics.rs:7-29): PRODID, escaped headers, folded lines. */
  def toIcs(title: String, source: String, desc: String, items: Seq[CalendarEvent]): String = {
    val lines = Seq(
      "BEGIN:VCALENDAR", "VERSION:2.0", "CALSCALE:GREGORIAN",
      "PRODID:-//ssufid//calendar//KO",
      s"X-WR-CALNAME:${TextKernel.icsEscape(title)}",
      s"X-WR-CALDESC:${TextKernel.icsEscape(desc)}",
      s"URL:$source") ++
      items.flatMap(eventLines) :+ "END:VCALENDAR"
    lines.map(TextKernel.icsFold).mkString("\r\n") + "\r\n"
  }

  private def headerLines(title: String, source: String, desc: String): Seq[String] = Seq(
    "BEGIN:VCALENDAR", "VERSION:2.0", "CALSCALE:GREGORIAN",
    "PRODID:-//ssufid//calendar//KO",
    s"X-WR-CALNAME:${TextKernel.icsEscape(title)}",
    s"X-WR-CALDESC:${TextKernel.icsEscape(desc)}",
    s"URL:$source")

  /**
   * Same VCALENDAR document, but the per-event escape/fold rendering runs
   * DISTRIBUTED (one folded VEVENT block per row); the driver only
   * concatenates the already-rendered block strings, in the dataset's sort
   * order — byte-identical to [[toIcs]] over the same ordered items, with
   * no Row collect on the driver.
   */
  def toIcsDistributed(
      title: String, source: String, desc: String,
      items: Dataset[CalendarEvent]): String = {
    import items.sparkSession.implicits._
    val blocks = items
      .map(e => eventLines(e).map(TextKernel.icsFold).mkString("\r\n"))
      .collect()
    (headerLines(title, source, desc).map(TextKernel.icsFold) ++
      blocks :+ TextKernel.icsFold("END:VCALENDAR")).mkString("\r\n") + "\r\n"
  }
}

object SiteJson {

  private[graft] val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m
  }

  /** Rehydrate a Post from Spark's to_json output (used by grouped sinks). */
  def postFromJson(json: String): Post = {
    val n = mapper.readTree(json)
    def opt(f: String): Option[String] =
      if (n.has(f) && !n.get(f).isNull) Some(n.get(f).asText()) else None
    def ts(f: String): Option[Timestamp] =
      opt(f).map(v => Timestamp.from(java.time.OffsetDateTime.parse(v).toInstant))
    import scala.jdk.CollectionConverters._
    val cats =
      if (n.has("category")) n.get("category").elements().asScala.map(_.asText()).toSeq
      else Seq.empty
    val atts =
      if (n.has("attachments"))
        n.get("attachments").elements().asScala.map { a =>
          graft.model.Attachment(a.get("url").asText(),
            if (a.has("name") && !a.get("name").isNull) Some(a.get("name").asText()) else None,
            if (a.has("mime_type") && !a.get("mime_type").isNull) Some(a.get("mime_type").asText()) else None)
        }.toSeq
      else Seq.empty
    Post(
      site_id = n.get("site_id").asText(), id = n.get("id").asText(),
      url = n.get("url").asText(), author = opt("author"),
      title = n.get("title").asText(), description = opt("description"),
      category = cats,
      created_at = ts("created_at").getOrElse(new Timestamp(0)),
      updated_at = ts("updated_at"),
      thumbnail = opt("thumbnail"),
      content = if (n.has("content")) n.get("content").asText() else "",
      attachments = atts, metadata = None)
  }

  /**
   * serde_json::to_string_pretty layout (the reference's per-site cache
   * emitter, cli main.rs:269-301 uses exactly this): 2-space indent,
   * `"key": value`, one element per line, `[]`/`{}` for empties. Scalars
   * render in Jackson's compact form (same escaping rules).
   */
  private[graft] def pretty(n: com.fasterxml.jackson.databind.JsonNode,
      ind: String = ""): String = {
    import scala.jdk.CollectionConverters._
    val childInd = ind + "  "
    if (n.isObject) {
      val fields = n.fields().asScala.toSeq
      if (fields.isEmpty) "{}"
      else fields.map { e =>
        val key = com.fasterxml.jackson.databind.node.TextNode.valueOf(e.getKey).toString
        s"$childInd$key: ${pretty(e.getValue, childInd)}"
      }.mkString("{\n", ",\n", s"\n$ind}")
    } else if (n.isArray) {
      val els = n.elements().asScala.toSeq
      if (els.isEmpty) "[]"
      else els.map(e => childInd + pretty(e, childInd)).mkString("[\n", ",\n", s"\n$ind]")
    } else n.toString
  }

  // SsufidPost serde field order (post.rs:23-41) — no skip_serializing_if
  // anywhere, so serde_json emits EVERY field, None as `null`
  private val PostFieldOrder = Seq("id", "url", "author", "title", "description",
    "category", "created_at", "updated_at", "thumbnail", "content",
    "attachments", "metadata")
  private val AttachmentFieldOrder = Seq("url", "name", "mime_type")

  /** Spark's to_json drops null fields and stamps `.000` second fractions;
    * serde_json::to_string_pretty emits every SsufidPost field (None ->
    * null, post.rs has no skip_serializing_if) in declaration order, and
    * time's RFC3339 formatter omits an all-zero subsecond part. Rebuild
    * the item node to that exact shape. */
  private def serdeShapedItem(postJson: String): com.fasterxml.jackson.databind.JsonNode = {
    def rfc3339(n: com.fasterxml.jackson.databind.JsonNode) =
      if (n == null || n.isNull) n
      else new com.fasterxml.jackson.databind.node.TextNode(
        n.asText().replaceFirst("\\.0+Z$", "Z"))
    val src = mapper.readTree(postJson)
    val item = mapper.createObjectNode()
    PostFieldOrder.foreach { f =>
      val v = src.get(f) match {
        case null => com.fasterxml.jackson.databind.node.NullNode.getInstance()
        case n if f == "created_at" || f == "updated_at" => rfc3339(n)
        case n if f == "attachments" =>
          val arr = mapper.createArrayNode()
          n.elements().forEachRemaining { a =>
            val att = mapper.createObjectNode()
            AttachmentFieldOrder.foreach(af => att.set[com.fasterxml.jackson.databind.JsonNode](
              af, Option(a.get(af)).getOrElse(
                com.fasterxml.jackson.databind.node.NullNode.getInstance())))
            arr.add(att)
          }
          arr
        case n => n
      }
      item.set[com.fasterxml.jackson.databind.JsonNode](f, v)
    }
    item
  }

  /**
   * Per-site JSON payload (cli main.rs:202-213 shape:
   * {title, source, description, items: [...]}) — one row per site,
   * PRETTY-printed byte-for-byte like the reference's
   * serde_json::to_string_pretty output, items in exact SsufidPost serde
   * shape (declaration field order, None as null, RFC3339 timestamps
   * without zero fractions).
   */
  def perSite(posts: DataFrame): DataFrame = {
    val spark = posts.sparkSession
    import spark.implicits._
    posts.select(col("site_id"), col("rank"), to_json(struct(
      posts.columns.filter(_ != "rank").map(col): _*)).as("post_json"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .mapGroups { (site: String, rows: Iterator[(String, Long, String)]) =>
        val root = mapper.createObjectNode()
        root.put("title", site)
        root.put("source", s"https://$site")
        root.put("description", s"$site notices")
        val arr = root.putArray("items")
        rows.toSeq.sortBy(-_._2).foreach(r => arr.add(serdeShapedItem(r._3)))
        (site, pretty(root))
      }
      .toDF("site_id", "site_json")
  }

  /** Write one file per site (the reference's {out}/{site}/data.json
    * layout). Dynamic partition overwrite: a run that covers a subset of
    * sites replaces only those sites' files — uncrawled sites keep their
    * last-good output (the reference publish never deletes). */
  def write(perSiteJson: DataFrame, outDir: String): Unit =
    perSiteJson.repartition(col("site_id"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("site_id").json(outDir)
}

/** Crawl report (K5): JSON-lines event stream + the jq-style aggregation. */
object Report {

  def write(events: DataFrame, outDir: String): Unit =
    events.write.mode("overwrite").json(outDir)

  /** analyze-report aggregation (action.yml:40-52): counts by event type. */
  def summary(events: DataFrame): DataFrame =
    events.groupBy("event").agg(count(lit(1)).as("n"))
}
