package graft.sinks

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import graft.SparkSuite

/** Publish (K6): the analyze-report markdown layout
  * (actions/analyze-report/action.yml:59-77) and the commit-on-change /
  * no-op-when-clean publish step (daemon.yml:127-143). */
class PublishSpec extends SparkSuite {

  private def events(rows: (String, String, String, String, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("site_id", "event", "post_id", "title", "url")
  }

  test("markdown report golden: created + updated + failure counts (action.yml:59-77)") {
    val md = Publish.markdownReport(events(
      ("scatch.ssu.ac.kr", "crawl_success", null, null, null),
      ("cse.ssu.ac.kr", "crawl_success", null, null, null),
      ("ee.ssu.ac.kr", "crawl_failed", null, "boom", null),
      ("cse.ssu.ac.kr", "post_created", "p1", "New CSE Post", "https://cse.ssu.ac.kr/p1"),
      ("cse.ssu.ac.kr", "post_created", "p2", "Another CSE Post", "https://cse.ssu.ac.kr/p2"),
      ("scatch.ssu.ac.kr", "post_updated", "p9", "Edited Post", "https://scatch.ssu.ac.kr/p9")))
    assert(md.startsWith("# 컨텐츠 업데이트\n\n2 성공, **1 실패**\n"))
    assert(md.contains("## 게시된 공지\n### cse.ssu.ac.kr\n> 2 new posts\n"))
    assert(md.contains("- [New CSE Post](https://cse.ssu.ac.kr/p1)"))
    assert(md.contains("- [Another CSE Post](https://cse.ssu.ac.kr/p2)"))
    assert(md.contains("## 수정된 공지\n### scatch.ssu.ac.kr\n> 1 updated posts\n" +
      "- [Edited Post](https://scatch.ssu.ac.kr/p9)"))
    assert(!md.contains("게시 혹은 변경된 공지가 없습니다"))
  }

  test("markdown report: nothing-changed line when no created/updated (action.yml:73-75)") {
    val md = Publish.markdownReport(events(
      ("scatch.ssu.ac.kr", "crawl_success", null, null, null)))
    assert(md.contains("1 성공, **0 실패**"))
    assert(md.contains("_게시 혹은 변경된 공지가 없습니다._"))
    assert(!md.contains("## 게시된 공지"))
  }

  test("publish: commit on change, no-op when clean, parent chain, vanished-file sweep") {
    val src = Files.createTempDirectory("graft-pub-src")
    val repo = Files.createTempDirectory("graft-pub-repo")
    Files.createDirectories(src.resolve("sites/a"))
    Files.writeString(src.resolve("sites/a/data.json"), """{"x":1}""")
    Files.writeString(src.resolve("calendar.ics"), "BEGIN:VCALENDAR")
    val now = Timestamp.valueOf("2026-01-15 03:00:00") // 12:00 KST

    val c1 = Publish.publish(spark, repo.toString, Seq("" -> src.toString), now)
    assert(c1.created && c1.parent.isEmpty && c1.files == 2)
    // reference commit message format, Asia/Seoul clock (daemon.yml:139-143)
    assert(c1.message == "update: 2026-01-15 12:00")
    assert(Files.readString(repo.resolve("sites/a/data.json")) == """{"x":1}""")
    assert(Files.readString(repo.resolve(".graft/HEAD")).trim == c1.id)

    // clean tree -> "no changes to commit": same HEAD, no new commit record
    val c2 = Publish.publish(spark, repo.toString, Seq("" -> src.toString), now)
    assert(!c2.created && c2.id == c1.id)

    // changed + removed file -> new commit with parent chain; the vanished
    // file is swept from the working tree, .graft metadata untouched
    Files.writeString(src.resolve("sites/a/data.json"), """{"x":2}""")
    Files.delete(src.resolve("calendar.ics"))
    val c3 = Publish.publish(spark, repo.toString, Seq("" -> src.toString),
      Timestamp.valueOf("2026-01-16 03:00:00"))
    assert(c3.created && c3.parent.contains(c1.id) && c3.files == 1)
    assert(Files.readString(repo.resolve("sites/a/data.json")) == """{"x":2}""")
    assert(!Files.exists(repo.resolve("calendar.ics")))
    assert(Files.exists(repo.resolve(s".graft/commits/${c1.id}.json")))
    assert(Files.readString(repo.resolve(".graft/HEAD")).trim == c3.id)

    // prefixed source lands under its prefix (cp -rv ssufid/.cache/ .)
    val cache = Files.createTempDirectory("graft-pub-cache")
    Files.writeString(cache.resolve("part-0.parquet"), "bytes")
    val c4 = Publish.publish(spark, repo.toString,
      Seq("" -> src.toString, ".cache" -> cache.toString),
      Timestamp.valueOf("2026-01-17 03:00:00"))
    assert(c4.created && c4.files == 2)
    assert(Files.readString(repo.resolve(".cache/part-0.parquet")) == "bytes")
  }
}
