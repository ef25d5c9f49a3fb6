package graft.sources

import java.sql.Timestamp
import graft.SparkSuite

class JsonApisSpec extends SparkSuite {
  import spark.implicits._

  test("media envelope: success flag, Lexical content render, KST dates (media lib.rs:96-140)") {
    val lexical = """{\"root\":{\"children\":[{\"type\":\"paragraph\",\"children\":[{\"type\":\"text\",\"text\":\"안내\"}]}]}}"""
    val body =
      s"""{"success":true,"code":"0","message":"ok","data":{"boards":[
         |{"id":42,"title":"공지 A","isPinned":true,"content":"$lexical",
         | "userName":"관리자","createdAt":"2024-03-22 12:00:00"}],
         |"page":1,"size":20,"totalPage":3}}""".stripMargin.replaceAll("\n", "")
    val out = JsonApis.parseMedia(
      Seq(("media.ssu.ac.kr", body)).toDF("site_id", "body"),
      "https://media.ssu.ac.kr/board/notices").collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("id") === "42")
    assert(r.getAs[Seq[String]]("category") === Seq("공지"))
    assert(r.getAs[String]("content") === "<p>안내</p>")
    // 12:00 KST == 03:00 UTC
    assert(r.getAs[Timestamp]("created_at") === Timestamp.valueOf("2024-03-22 03:00:00"))
  }

  test("media envelope: success=false yields no rows") {
    val body = """{"success":false,"code":"1","message":"err","data":{"boards":[]}}"""
    assert(JsonApis.parseMedia(Seq(("m", body)).toDF("site_id", "body"), "https://m").count() === 0)
  }

  test("startup envelope: Y/N flag + ISO-T datetime (startup lib.rs:134-194)") {
    val body =
      """{"code":"0","message":"ok","data":{"content":{"list":[
        |{"seq":7,"title":"모집","contents":"<p>x</p>","noticeYn":"y","regDt":"2024-03-22T09:30:00"}]}}}"""
        .stripMargin.replaceAll("\n", "")
    val r = JsonApis.parseStartup(Seq(("startup.ssu.ac.kr", body)).toDF("site_id", "body"),
      "https://startup.ssu.ac.kr/board/notice").collect().head
    assert(r.getAs[Boolean]("is_announcement"))
    assert(r.getAs[Timestamp]("created_at") === Timestamp.valueOf("2024-03-22 00:30:00"))
  }

  test("stu envelope: yyyy/MM/dd dialect (stu lib.rs:104-105)") {
    val body =
      """{"isSuccess":true,"code":"0","message":"ok","data":{"postListResDto":[
        |{"postId":3,"title":"t","content":"c","writer":"w","createdAt":"2024/03/22 10:00:00"}]}}"""
        .stripMargin.replaceAll("\n", "")
    val r = JsonApis.parseStu(Seq(("stu", body)).toDF("site_id", "body"), "https://stu").collect().head
    assert(r.getAs[Timestamp]("created_at") === Timestamp.valueOf("2024-03-22 01:00:00"))
  }

  test("ssfilm envelope: lenient bool|string cursor (ssfilm lib.rs:80-96)") {
    val more =
      """{"data_list":[{"notice_index":10,"notice_title":"t","notice_content":"c","reg_date":"2024-03-22 10:00:00"}],
        |"restCount":5,"LastNoticeIndex":"10"}""".stripMargin.replaceAll("\n", "")
    val done =
      """{"data_list":[],"restCount":0,"LastNoticeIndex":false}"""
    val outMore = JsonApis.parseSsfilm(Seq(("s", more)).toDF("site_id", "body"), "https://s").collect()
    assert(outMore.head.getAs[String]("cursor") === "10")
    assert(JsonApis.parseSsfilm(Seq(("s", done)).toDF("site_id", "body"), "https://s").count() === 0)
  }

  test("study lz-compressed transport round-trip + base64 sbSeq URL (study lib.rs:23-42, model.rs:222-230)") {
    val payload =
      """{"uri":"/study/list","siteCd":"SSU","boardCd":"notice",
        |"paginationInfo":{"totalPageCount":7},
        |"list":[{"sbSeq":2945,"title":"스터디 공지","userNm":"kim","regDt":"2024.03.22",
        |"fileList":[{"fileNm":"안내.hwp","fileUrl":"https://study/f/1"}]}]}"""
        .stripMargin.replaceAll("\n", "")
    val compressed = graft.functions.LzString.compressToUtf16(payload)
    val r = JsonApis.parseStudy(Seq(("study", compressed)).toDF("site_id", "body"),
      "https://study.ssu.ac.kr/community/notice_view.do").collect().head
    assert(r.getAs[String]("id") === "2945")
    // reference golden: sbSeq=2945 -> base64 "Mjk0NQ=="
    assert(r.getAs[String]("url").endsWith("?sbSeq=Mjk0NQ=="))
    assert(r.getAs[Int]("total_pages") === 7)
    val att = r.getAs[Seq[org.apache.spark.sql.Row]]("attachments").head
    assert(att.getAs[String]("mime_type") === "application/x-hwp")
  }
}
