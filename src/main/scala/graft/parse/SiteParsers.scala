package graft.parse

import java.sql.Timestamp
import java.time.{LocalDate, LocalDateTime, ZoneOffset}
import graft.functions.{TextKernel, UrlKernel}
import graft.model.{Attachment, CalendarEvent, Post}

/**
 * Site-family parsers (SURVEY.md §2.3 P1-P15): pure functions from raw
 * page HTML to typed rows, reproducing the reference plugins' selector
 * semantics. All dates are parsed assuming KST (+09:00) and normalized to
 * UTC, like the reference (`assume_offset(+9)` at every parse site).
 */
object SiteParsers {

  private val KstOffset = ZoneOffset.ofHours(9)

  private[parse] def kstToUtc(dt: LocalDateTime): Timestamp =
    Timestamp.from(dt.atOffset(KstOffset).toInstant)

  /** EUC-KR byte decode (S10 — plugins/ssudorm/src/lib.rs:102-104). */
  def decodeEucKr(bytes: Array[Byte]): String =
    new String(bytes, java.nio.charset.Charset.forName("EUC-KR"))

  final case class ListRowMeta(
      category: Option[String], id: String, url: String, author: Option[String])

  // ---- gnuboard family (P1/P2) --------------------------------------------

  /**
   * List-row resolver (plugins/common/src/common/gnuboard/metadata.rs:24-71):
   * category `td.td_num2 > p`, url `td.td_subject > div > a`, id = query
   * param `wr_id` (non-empty), author `td.td_name.sv_use > span`.
   * Returns None when the row is malformed (drop-with-warn, P15).
   */
  def gnuboardListRow(row: Html.Node): Option[ListRowMeta] = {
    val category = row.selectFirst("td.td_num2 > p").map(_.text)
    for {
      a <- row.selectFirst("td.td_subject > div > a")
      url <- a.attr("href")
      id <- Option(UrlKernel.queryParam(url, "wr_id")).filter(_.nonEmpty)
    } yield ListRowMeta(category, id, url,
      row.selectFirst("td.td_name.sv_use > span").map(_.text))
  }

  /**
   * Detail parser (gnuboard/mod.rs:150-232): title `#bo_v_title
   * span.bo_v_tit`; thumbnail = first `#bo_v_con img` src; content = child
   * elements' HTML joined with \n; attachments `#bo_v_file li a` (name =
   * first child element text); created_at `.if_date` LAST text token pair,
   * "20{yy-MM-dd HH:mm}" assumed KST.
   */
  def gnuboardDetail(html: String, meta: ListRowMeta, siteId: String): Option[Post] = {
    val doc = Html.parse(html)
    for {
      title <- doc.selectFirst("#bo_v_title span.bo_v_tit").map(_.text)
      contentEl <- doc.selectFirst("#bo_v_con")
      dateEl <- doc.selectFirst(".if_date")
      created <- parseGnuboardDate(dateEl.text)
    } yield {
      val thumbnail = doc.selectFirst("#bo_v_con img").flatMap(_.attr("src"))
      val content = contentEl.elements.map(_.outerHtml).mkString("\n")
      val attachments = doc.select("#bo_v_file li a").flatMap { a =>
        a.attr("href").map { href =>
          Attachment(href, a.elements.headOption.map(_.text), None)
        }
      }
      Post(siteId, meta.id, meta.url, meta.author, title, None,
        meta.category.toSeq, created, None, thumbnail, content, attachments, None)
    }
  }

  /** `"작성일 24-03-22 12:00"` -> 2024-03-22 12:00 KST -> UTC. */
  private[parse] def parseGnuboardDate(text: String): Option[Timestamp] = {
    val m = "(\\d{2})-(\\d{2})-(\\d{2})\\s+(\\d{2}):(\\d{2})".r.findFirstMatchIn(text)
    m.map { g =>
      kstToUtc(LocalDateTime.of(2000 + g.group(1).toInt, g.group(2).toInt,
        g.group(3).toInt, g.group(4).toInt, g.group(5).toInt))
    }
  }

  // ---- wordpress family (P3/P4) -------------------------------------------

  final case class WpListRow(
      isAnnouncement: Boolean, title: String, url: String, createdAt: Timestamp)

  /**
   * Table-layout list row (wordpress/metadata.rs:16-96): positional td
   * walk — td[0] number or 공지 (announcement flag), td[1] a (title+href),
   * last td = date in one of 3 dialects.
   */
  def wordpressListRow(row: Html.Node): Option[WpListRow] = {
    val tds = row.select("td")
    if (tds.size < 3) return None
    val isAnnouncement = {
      val t = tds.head.text
      t.contains("공지") || t.toIntOption.isEmpty
    }
    for {
      a <- tds(1).selectFirst("a").orElse(tds(1).selectFirst("div a"))
      url <- a.attr("href")
      date <- parseWordpressDate(tds.last.text)
    } yield WpListRow(isAnnouncement, a.text, url, date)
  }

  /**
   * The three reference date dialects (metadata.rs:82-96): `yyyy-MM-dd`,
   * `yyyy.MM.dd`, `yyyy년 M월 d일` — all midnight KST.
   */
  private[parse] def parseWordpressDate(text: String): Option[Timestamp] = {
    val t = text.trim
    val iso = "(\\d{4})-(\\d{2})-(\\d{2})".r
    val dot = "(\\d{4})\\.(\\d{2})\\.(\\d{2})".r
    val kr = "(\\d{4})년\\s*(\\d{1,2})월\\s*(\\d{1,2})일".r
    val m = iso.findFirstMatchIn(t).orElse(dot.findFirstMatchIn(t))
      .orElse(kr.findFirstMatchIn(t))
    m.map(g => kstToUtc(LocalDate.of(g.group(1).toInt, g.group(2).toInt,
      g.group(3).toInt).atStartOfDay))
  }

  /**
   * Detail (wordpress/mod.rs:171-228): id = `slug` query param; title
   * `table.t_view p.title`; content `div.td_box` inner HTML; category =
   * ["공지"] iff announcement.
   */
  def wordpressDetail(html: String, row: WpListRow, siteId: String): Option[Post] = {
    val doc = Html.parse(html)
    for {
      id <- Option(UrlKernel.queryParam(row.url, "slug")).filter(_.nonEmpty)
      titleEl <- doc.selectFirst("table.t_view p.title")
      contentEl <- doc.selectFirst("div.td_box")
    } yield Post(siteId, id, row.url, None, titleEl.text, None,
      if (row.isAnnouncement) Seq("공지") else Seq.empty,
      row.createdAt, None, None, contentEl.innerHtml, Seq.empty, None)
  }

  // ---- ssucatch (P5) --------------------------------------------------------

  final case class SsucatchRow(
      id: String, url: String, categories: Seq[String], createdAt: Timestamp)

  /**
   * List (plugins/ssucatch/src/lib.rs:82-229): `.notice-lists li` rows
   * (caller skips the header row); link in `.notice_col3 a` with `slug`
   * param; categories from `span.label`s; Korean long date.
   */
  def ssucatchListRows(html: String): Seq[SsucatchRow] = {
    val doc = Html.parse(html)
    doc.select(".notice-lists li").drop(1).flatMap { li =>
      for {
        a <- li.selectFirst(".notice_col3 a")
        url <- a.attr("href")
        id <- Option(UrlKernel.queryParam(url, "slug")).filter(_.nonEmpty)
        date <- parseWordpressDate(li.selectFirst(".notice_col4").map(_.text)
          .getOrElse(li.text))
      } yield SsucatchRow(id, url, li.select("span.label").map(_.text), date)
    }
  }

  /** Detail attachments: `a[download]` with BASE_URL-relative resolve. */
  def ssucatchAttachments(html: String, baseUrl: String): Seq[Attachment] =
    Html.parse(html).select("a[download]").flatMap { a =>
      a.attr("href").map { href =>
        val url = UrlKernel.resolve(baseUrl, href)
        Attachment(url, Some(a.text).filter(_.nonEmpty), Option(TextKernel.mimeGuess(url)))
      }
    }

  // ---- biz-style combined fields (P7) ----------------------------------------

  /** `"2024-03-22 / 관리자"` -> (date, author) (plugins/biz lib.rs:103-118). */
  def splitDateAuthor(s: String): Option[(Timestamp, Option[String])] = {
    val parts = s.split("/", 2).map(_.trim)
    parseWordpressDate(parts(0)).map { d =>
      (d, parts.lift(1).filter(_.nonEmpty))
    }
  }

  // ---- chemeng fallbacks (P6) --------------------------------------------------

  /**
   * 공지 pseudo-id synthesis when `idx` is missing
   * (plugins/chemeng/src/lib.rs:146-247): `notice_{date}_{title[..10]}`
   * — title truncated at 10 CHARS (codepoint-safe).
   */
  def chemengPseudoId(dateStr: String, title: String): String = {
    val cps = title.codePoints().toArray
    val head = new String(cps, 0, math.min(10, cps.length))
    s"notice_${dateStr}_$head"
  }

  /** Body-text total-pages probe: `페이지정보 : X / Y` (lib.rs:341-372). */
  def chemengTotalPages(bodyText: String): Option[Int] =
    "페이지정보\\s*:\\s*\\d+\\s*/\\s*(\\d+)".r.findFirstMatchIn(bodyText)
      .map(_.group(1).toInt)

  // ---- ssudorm positional rows (P9) ---------------------------------------------

  /**
   * Row id packed in an href like `javascript:view('B0001','1234','x')`
   * — split on quote/comma, take the length-2.. numeric token
   * (plugins/ssudorm/src/lib.rs:137-201). Rows: skip(2) positional walk;
   * detail labels `작성자:` / `등록일:` split.
   */
  def ssudormRowId(href: String): Option[String] =
    href.split("['，,]").map(_.trim).filter(t => t.nonEmpty && t.forall(_.isDigit))
      .sortBy(-_.length).headOption

  /** `작성자: kim` / `등록일: 2024-03-22 12:00` label splits (lib.rs:244-266). */
  def labeledValue(text: String, label: String): Option[String] = {
    val idx = text.indexOf(label)
    if (idx < 0) None
    else Some(text.substring(idx + label.length).trim.takeWhile(_ != '\n').trim)
      .filter(_.nonEmpty)
  }

  // ---- wordpress card-layout variant (mgmt — P3) ---------------------------------

  /**
   * Card list (plugins/common/src/sites/mgmt.rs:49-107): `div.card_cont >
   * a` cards; class-based notice flag on `.board_tit`; date in
   * `.etc_info .date .date_val`.
   */
  def wordpressCardRow(card: Html.Node): Option[WpListRow] = {
    for {
      a <- card.selectFirst("a").orElse(Some(card)).filter(_.attr("href").isDefined)
      url <- a.attr("href")
      titleEl <- card.selectFirst(".board_tit")
      date <- card.selectFirst(".etc_info .date .date_val").map(_.text)
        .flatMap(parseWordpressDate)
    } yield WpListRow(titleEl.classes.contains("notice"), titleEl.text, url, date)
  }

  // ---- ee dual-format dates (P8) ---------------------------------------------

  /** `Y-M-D H:M:S` else `Y.M.D` midnight (plugins/ee lib.rs:97-111). */
  def parseEeDate(text: String): Option[Timestamp] = {
    val full = "(\\d{4})-(\\d{2})-(\\d{2})\\s+(\\d{2}):(\\d{2}):(\\d{2})".r
    full.findFirstMatchIn(text.trim) match {
      case Some(g) => Some(kstToUtc(LocalDateTime.of(g.group(1).toInt, g.group(2).toInt,
        g.group(3).toInt, g.group(4).toInt, g.group(5).toInt, g.group(6).toInt)))
      case None => parseWordpressDate(text)
    }
  }
}

/**
 * Academic-calendar parser (P14) — full port of
 * plugins/ssu-academic-calendar/src/lib.rs:104-369 including partial-date
 * range inference (cross-month / cross-year) and stable slug event ids,
 * verified against the reference's own SAMPLE_HTML fixture.
 */
object CalendarParser {

  private val KstOffset = ZoneOffset.ofHours(9)
  val Identifier = "ssu-academic-calendar"

  final case class PartialDate(month: Option[Int], day: Int)

  def parseYearPage(html: String, year: Int, pageUrl: String): Seq[CalendarEvent] = {
    val doc = Html.parse(html)
    if (doc.selectFirst("#calendar").isEmpty) return Seq.empty
    doc.select("#calendar > div[id^=calendar]").flatMap { block =>
      block.selectFirst("span.font-size-50").map(_.text.trim.toInt) match {
        case None => Seq.empty
        case Some(month) =>
          block.select("ul.tb > li").flatMap { li =>
            parseEvent(li, year, month, pageUrl)
          }
      }
    }
  }

  private def parseEvent(
      li: Html.Node, year: Int, month: Int, pageUrl: String): Option[CalendarEvent] = {
    val cols = li.select(".row > div")
    if (cols.size < 2) return None
    val dateText = cols(0).text
    val title = TextKernel.normalizeWs(cols(1).text)
    if (dateText.isEmpty || title.isEmpty) return None
    parseEventDates(dateText, year, month).map { case (startsAt, endsAt) =>
      val url = cols(1).selectFirst("a[href]").flatMap(_.attr("href"))
        .map(href => UrlKernel.resolve(pageUrl, href))
        .orElse(Some(pageUrl))
      CalendarEvent(
        buildEventId(title, startsAt, endsAt), title, None, startsAt, endsAt, None, url)
    }
  }

  /**
   * Range parse with partial-date inference (lib.rs:197-271):
   * `MM.DD ~ MM.DD` (end month < start month -> next year),
   * `MM.DD ~ DD`   (end day < start day -> next month),
   * single `MM.DD` -> same-day range; start 00:00:00, end 23:59:59, KST.
   */
  def parseEventDates(raw: String, year: Int, fallbackMonth: Int): Option[(Timestamp, Option[Timestamp])] = {
    val normalized = TextKernel.normalizeWs(
      TextKernel.normalizeDashes(TextKernel.stripParens(raw)))
    val parts = normalized.split('~').map(_.trim).filter(_.nonEmpty)
    if (parts.isEmpty) return None
    for {
      startPd <- parsePartialDate(parts(0))
    } yield {
      val startMonth = startPd.month.getOrElse(fallbackMonth)
      val startDate = LocalDate.of(year, startMonth, startPd.day)
      val startsAt = ts(startDate.atStartOfDay)
      if (parts.length == 1) {
        (startsAt, Some(ts(startDate.atTime(23, 59, 59))))
      } else {
        parsePartialDate(parts(1)) match {
          case None => (startsAt, Some(ts(startDate.atTime(23, 59, 59))))
          case Some(endPd) =>
            val (endYear, endMonth) = endPd.month match {
              case Some(em) => (if (em < startMonth) year + 1 else year, em)
              case None =>
                if (endPd.day < startPd.day) nextMonth(year, startMonth)
                else (year, startMonth)
            }
            (startsAt, Some(ts(LocalDate.of(endYear, endMonth, endPd.day).atTime(23, 59, 59))))
        }
      }
    }
  }

  private def ts(dt: LocalDateTime): Timestamp =
    Timestamp.from(dt.atOffset(KstOffset).toInstant)

  def parsePartialDate(token: String): Option[PartialDate] = {
    val t = token.trim.stripSuffix(".")
    t.split("\\.", 2) match {
      case Array(m, d) if m.trim.forall(_.isDigit) && d.trim.forall(_.isDigit)
        && m.trim.nonEmpty && d.trim.nonEmpty =>
        Some(PartialDate(Some(m.trim.toInt), d.trim.toInt))
      case Array(d) if d.trim.nonEmpty && d.trim.forall(_.isDigit) =>
        Some(PartialDate(None, d.trim.toInt))
      case _ => None
    }
  }

  private def nextMonth(year: Int, month: Int): (Int, Int) =
    if (month == 12) (year + 1, 1) else (year, month + 1)

  /** `{IDENTIFIER}:{start_date}:{end_date|_}:{slug(title)}` (lib.rs:332-369). */
  def buildEventId(title: String, startsAt: Timestamp, endsAt: Option[Timestamp]): String = {
    def kstDate(t: Timestamp): String =
      t.toInstant.atOffset(KstOffset).toLocalDate.toString
    val end = endsAt.map(kstDate).getOrElse("_")
    s"$Identifier:${kstDate(startsAt)}:$end:${TextKernel.slugify(title)}"
  }
}
