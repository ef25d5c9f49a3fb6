package graft.parse

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

class HtmlSpec extends AnyFunSuite {

  test("parses nested elements, attrs, text") {
    val doc = Html.parse(
      """<div id="a" class="x y"><p>hello <b>world</b></p><img src="i.png"></div>""")
    val div = doc.selectFirst("#a").get
    assert(div.classes === Set("x", "y"))
    assert(div.selectFirst("p").get.text === "hello world")
    assert(div.selectFirst("img").get.attr("src") === Some("i.png"))
  }

  test("selector subset: tag.class, child, descendant, attr ops") {
    val doc = Html.parse(
      """<table><tbody>
        |<tr><td class="td_num2"><p>공지</p></td>
        |    <td class="td_subject"><div><a href="board.php?bo_table=x&wr_id=9">T</a></div></td>
        |    <td class="td_name sv_use"><span>kim</span></td></tr>
        |</tbody></table>""".stripMargin)
    assert(doc.select("td.td_num2 > p").map(_.text) === Vector("공지"))
    assert(doc.selectFirst("td.td_subject > div > a").get.attr("href").get.contains("wr_id=9"))
    assert(doc.select("td.td_name.sv_use > span").map(_.text) === Vector("kim"))
    assert(doc.select("a[href*=wr_id]").size === 1)
    assert(doc.select("a[href^=board]").size === 1)
    assert(doc.select("a[download]").isEmpty)
  }

  test("tolerates unclosed tags, comments, script content") {
    val doc = Html.parse(
      "<div><!-- c --><script>var x = '<p>not html</p>';</script><p>a<p>b</div>")
    assert(doc.select("p").map(_.text) === Vector("a", "b"))
  }

  test("id-prefix selector (div[id^=calendar])") {
    val doc = Html.parse(
      """<div id="calendar"><div id="calendar202601">x</div><div id="other">y</div></div>""")
    assert(doc.select("#calendar > div[id^=calendar]").map(_.text) === Vector("x"))
  }

  test("innerHtml round-trips child elements") {
    val doc = Html.parse("""<div id="c"><p>a</p><img src="u"><p>b</p></div>""")
    val c = doc.selectFirst("#c").get
    assert(c.elements.map(_.outerHtml) ===
      Vector("<p>a</p>", """<img src="u">""", "<p>b</p>"))
  }
}

class SiteParsersSpec extends AnyFunSuite {
  import SiteParsers._

  test("gnuboard list row resolver (metadata.rs:24-71)") {
    val row = Html.parse(
      """<tr><td class="td_num2"><p> 학사 </p></td>
        |<td class="td_subject"><div><a href="https://x.ssu.ac.kr/bbs/board.php?bo_table=b&wr_id=123">제목</a></div></td>
        |<td class="td_name sv_use"><span>관리자</span></td></tr>""".stripMargin)
    val meta = gnuboardListRow(row).get
    assert(meta.category === Some("학사"))
    assert(meta.id === "123")
    assert(meta.author === Some("관리자"))
  }

  test("gnuboard list row without wr_id is dropped (P15)") {
    val row = Html.parse(
      """<tr><td class="td_subject"><div><a href="https://x/bbs/board.php?bo_table=b">t</a></div></td></tr>""")
    assert(gnuboardListRow(row).isEmpty)
  }

  test("gnuboard detail parse (mod.rs:150-232): content join, thumbnail, date 20yy KST") {
    val html =
      """<div id="bo_v_title"><span class="bo_v_tit">공지 제목</span></div>
        |<div id="bo_v_info"><span class="if_date">작성일 24-03-22 12:00</span></div>
        |<div id="bo_v_con"><p>첫 문단</p><img src="https://x/img.jpg"><p>둘째</p></div>
        |<div id="bo_v_file"><ul><li><a href="https://x/f.hwp"><strong>양식.hwp</strong></a></li></ul></div>
        |""".stripMargin
    val meta = ListRowMeta(Some("학사"), "123", "https://x/bbs/board.php?wr_id=123", Some("관리자"))
    val post = gnuboardDetail(html, meta, "x.ssu.ac.kr").get
    assert(post.title === "공지 제목")
    assert(post.thumbnail === Some("https://x/img.jpg"))
    assert(post.content === "<p>첫 문단</p>\n<img src=\"https://x/img.jpg\">\n<p>둘째</p>")
    assert(post.attachments === Seq(graft.model.Attachment("https://x/f.hwp", Some("양식.hwp"), None)))
    // 2024-03-22 12:00 KST == 03:00 UTC
    assert(post.created_at === Timestamp.valueOf("2024-03-22 03:00:00"))
    assert(post.category === Seq("학사"))
  }

  test("wordpress list row: announcement flag + 3 date dialects (metadata.rs:16-96)") {
    def row(num: String, date: String) = Html.parse(
      s"""<tr><td>$num</td><td><a href="https://w/?slug=post-1">T</a></td><td>x</td><td>$date</td></tr>""")
    val r1 = wordpressListRow(row("공지", "2024-03-22")).get
    assert(r1.isAnnouncement && r1.createdAt === Timestamp.valueOf("2024-03-21 15:00:00"))
    val r2 = wordpressListRow(row("17", "2024.03.22")).get
    assert(!r2.isAnnouncement && r2.createdAt === r1.createdAt)
    val r3 = wordpressListRow(row("18", "2024년 3월 22일")).get
    assert(r3.createdAt === r1.createdAt)
  }

  test("wordpress detail: slug id, title, content, 공지 category (mod.rs:171-228)") {
    val html =
      """<table class="t_view"><tr><td><p class="title">본문 제목</p></td></tr></table>
        |<div class="td_box"><p>내용</p></div>""".stripMargin
    val row = WpListRow(isAnnouncement = true, "T", "https://w/?slug=abc", Timestamp.valueOf("2024-03-21 15:00:00"))
    val post = wordpressDetail(html, row, "w.ssu.ac.kr").get
    assert(post.id === "abc")
    assert(post.title === "본문 제목")
    assert(post.content === "<p>내용</p>")
    assert(post.category === Seq("공지"))
  }

  test("ssucatch list rows skip header, multi-category, slug id (lib.rs:82-229)") {
    val html =
      """<ul class="notice-lists">
        |<li class="header">헤더</li>
        |<li><div class="notice_col2"><span class="label">장학</span><span class="label">학부</span></div>
        |    <div class="notice_col3"><a href="https://scatch.ssu.ac.kr/?slug=notice-7">공지7</a></div>
        |    <div class="notice_col4">2024년 3월 22일</div></li>
        |</ul>""".stripMargin
    val rows = ssucatchListRows(html)
    assert(rows.size === 1)
    assert(rows.head.id === "notice-7")
    assert(rows.head.categories === Seq("장학", "학부"))
  }

  test("ssucatch attachments resolve against base url with MIME guess") {
    val atts = ssucatchAttachments(
      """<div class="download-list"><a download href="/files/양식.hwp">양식.hwp</a></div>""",
      "https://scatch.ssu.ac.kr/공지사항/")
    assert(atts.size === 1)
    assert(atts.head.url === "https://scatch.ssu.ac.kr/files/양식.hwp")
    assert(atts.head.mime_type === Some("application/x-hwp"))
  }

  test("biz date/author combined split (lib.rs:103-118)") {
    val (d, a) = splitDateAuthor("2024-03-22 / 관리자").get
    assert(d === Timestamp.valueOf("2024-03-21 15:00:00"))
    assert(a === Some("관리자"))
    assert(splitDateAuthor("2024-03-22").get._2.isEmpty)
  }

  test("ee dual date format fallback (lib.rs:97-111)") {
    assert(parseEeDate("2024-03-22 10:30:05").get === Timestamp.valueOf("2024-03-22 01:30:05"))
    assert(parseEeDate("2024.03.22").get === Timestamp.valueOf("2024-03-21 15:00:00"))
  }

  test("chemeng pseudo-id + total-pages probe (lib.rs:146-247,341-372)") {
    assert(chemengPseudoId("2024-03-22", "공지사항입니다만이건너무길어요") === "notice_2024-03-22_공지사항입니다만이건")
    assert(chemengPseudoId("2024-03-22", "짧음") === "notice_2024-03-22_짧음")
    assert(chemengTotalPages("본문 ... 페이지정보 : 3 / 17 ...") === Some(17))
    assert(chemengTotalPages("no pages here").isEmpty)
  }

  test("ssudorm row id from packed href + labeled values (lib.rs:137-266)") {
    assert(ssudormRowId("javascript:goView('B0001','1234','etc')") === Some("1234"))
    assert(ssudormRowId("javascript:x('abc')").isEmpty)
    assert(labeledValue("작성자: 관리자\n등록일: 2024-03-22 12:00", "작성자:") === Some("관리자"))
    assert(labeledValue("등록일: 2024-03-22 12:00", "등록일:") === Some("2024-03-22 12:00"))
  }

  test("wordpress card-layout row (mgmt.rs:49-107)") {
    val card = Html.parse(
      """<div class="card_cont"><a href="https://m/?slug=x">
        |<span class="board_tit notice">공지 제목</span>
        |<div class="etc_info"><span class="date"><span class="date_val">2024-03-22</span></span></div>
        |</a></div>""".stripMargin)
    val row = wordpressCardRow(card.selectFirst(".card_cont").get).get
    assert(row.isAnnouncement)
    assert(row.title === "공지 제목")
    assert(row.createdAt === java.sql.Timestamp.valueOf("2024-03-21 15:00:00"))
  }

  test("EUC-KR decode (ssudorm lib.rs:102-104)") {
    val bytes = "기숙사 공지".getBytes(java.nio.charset.Charset.forName("EUC-KR"))
    assert(decodeEucKr(bytes) === "기숙사 공지")
  }
}

/** Port of the reference's SAMPLE_HTML year-page test
  * (ssu-academic-calendar lib.rs:384-553), with an equivalent fixture. */
class CalendarParserSpec extends AnyFunSuite {
  import CalendarParser._

  private def month(id: String, label: String, items: String) =
    s"""<div id="$id" class="row"><div class="col">
       |<div class="grid text-center"><span>2026</span>
       |<span class="h1 font-size-50">$label </span></div></div>
       |<div class="col"><div class="grid"><ul class="tb">$items</ul></div></div></div>""".stripMargin

  private def item(date: String, titleHtml: String) =
    s"""<li><div class="row"><div class="col-12 text-primary">$date</div>
       |<div class="col-12">$titleHtml</div></div></li>""".stripMargin

  private val pageHtml = "<div id=\"calendar\"><h4>2026년</h4>" +
    month("calendar202601", "01",
      item("01.05 (월) ~ 01.28 (수)", "2026학년도 1학기 휴학/복학 신청기간(1차)") +
        item("01.08 (목)", """<a href="/academic-event">2025학년도 2학기 성적증명서 발급개시</a>""")) +
    month("calendar202612", "12",
      item("12.28 (월) ~ 01.03 (일)", "겨울방학")) +
    "</div>"

  private val pageUrl = "https://scatch.ssu.ac.kr/학사일정/?years=2026"

  test("single-day event dates (lib.rs:449-456)") {
    val (s, e) = parseEventDates("01.08 (목)", 2026, 1).get
    // 2026-01-08 00:00 KST = 2026-01-07 15:00 UTC
    assert(s === Timestamp.valueOf("2026-01-07 15:00:00"))
    assert(e === Some(Timestamp.valueOf("2026-01-08 14:59:59")))
  }

  test("range event dates (lib.rs:459-466)") {
    val (s, e) = parseEventDates("02.23 (월) ~ 02.27 (금)", 2026, 2).get
    assert(s === Timestamp.valueOf("2026-02-22 15:00:00"))
    assert(e === Some(Timestamp.valueOf("2026-02-27 14:59:59")))
  }

  test("cross-year range event dates (lib.rs:469-476)") {
    val (s, e) = parseEventDates("12.28 (월) ~ 01.03 (일)", 2026, 12).get
    assert(s === Timestamp.valueOf("2026-12-27 15:00:00"))
    assert(e === Some(Timestamp.valueOf("2027-01-03 14:59:59")))
  }

  test("cross-month day-only end (lib.rs:227-243)") {
    val (s, e) = parseEventDates("03.30 ~ 02", 2026, 3).get
    assert(s === Timestamp.valueOf("2026-03-29 15:00:00"))
    assert(e === Some(Timestamp.valueOf("2026-04-02 14:59:59")))
  }

  test("event id is whitespace-stable (lib.rs:478-486)") {
    val t = Timestamp.valueOf("2026-03-02 15:00:00")
    assert(buildEventId("2026학년도   1학기 개강", t, None) ===
      buildEventId("2026학년도 1학기 개강", t, None))
  }

  test("year page parse (lib.rs:489-514)") {
    val items = parseYearPage(pageHtml, 2026, pageUrl)
    assert(items.size === 3)
    assert(items(0).title === "2026학년도 1학기 휴학/복학 신청기간(1차)")
    assert(items(0).starts_at === Timestamp.valueOf("2026-01-04 15:00:00"))
    assert(items(0).ends_at === Some(Timestamp.valueOf("2026-01-28 14:59:59")))
    assert(items(1).ends_at === Some(Timestamp.valueOf("2026-01-08 14:59:59")))
    assert(items(1).url === Some("https://scatch.ssu.ac.kr/academic-event"))
    assert(items(2).starts_at === Timestamp.valueOf("2026-12-27 15:00:00"))
    assert(items(2).ends_at === Some(Timestamp.valueOf("2027-01-03 14:59:59")))
    // stable ids use KST dates
    assert(items(2).id === "ssu-academic-calendar:2026-12-28:2027-01-03:겨울방학")
  }
}
