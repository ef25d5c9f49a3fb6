package graft

import graft.SparkSuite
import org.apache.spark.sql.functions._

class DaemonSpec extends SparkSuite {

  test("CLI option parsing mirrors the reference (mutually exclusive include/exclude)") {
    val o = Daemon.parseArgs(Array("--out", "/tmp/o", "--limit", "30",
      "--include", "a.ssu.ac.kr,b.ssu.ac.kr", "--scale", "100"))
    assert(o.limit === 30 && o.include.size === 2)
    intercept[IllegalArgumentException] {
      Daemon.parseArgs(Array("--include", "a", "--exclude", "b"))
    }
    intercept[IllegalArgumentException] {
      Daemon.parseArgs(Array("--bogus", "x"))
    }
  }

  test("daemon run end-to-end: filtered crawl, merge, sinks on disk") {
    val dir = java.nio.file.Files.createTempDirectory("graft-daemon").toString
    val opts = Daemon.Options(out = s"$dir/out", cache = s"$dir/cache",
      limit = 10, scale = 60,
      include = Seq("scatch.ssu.ac.kr", "biz.ssu.ac.kr", "cse.ssu.ac.kr/bachelor",
        "ssu-academic-calendar"))
    val out = Daemon.run(spark, opts)

    // include filter applied (semi join)
    val sites = out.topPosts.select("site_id").distinct()
      .collect().map(_.getString(0)).toSet
    assert(sites.subsetOf(opts.include.toSet), sites.toString)
    assert(sites.contains("scatch.ssu.ac.kr"))

    // sinks landed
    assert(new java.io.File(s"$dir/out/sites").exists())
    assert(new java.io.File(s"$dir/out/rss").exists())
    assert(new java.io.File(s"$dir/out/calendar.ics").exists())
    val ics = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/out/calendar.ics"))
    assert(ics.startsWith("BEGIN:VCALENDAR"))

    // next-run cache persisted and usable
    val next = spark.read.parquet(s"$dir/cache_next")
    assert(next.count() === out.cache.count())
  }
}
