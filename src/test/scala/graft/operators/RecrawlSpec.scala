package graft.operators

import java.sql.Timestamp
import graft.SparkSuite

class RecrawlSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("interval targets targetBatch new posts at the observed rate") {
    // site "a": 11 posts over 100 hours -> 10 gaps of 600 min each;
    // target 2 posts/crawl -> 2 * 6000 / 10 = 1200 min
    val posts = (0 to 10).map(i =>
      ("a", ts(f"2026-01-01 00:00:00").toLocalDateTime.plusHours(10L * i))
    ).map { case (s, t) => (s, Timestamp.valueOf(t)) }.toDF("site_id", "created_at")
    val out = Recrawl.schedule(posts, "site_id", "created_at",
      targetBatch = 2, minMinutes = 60, maxMinutes = 100000).collect()(0)
    assert(out.getAs[Long]("n_posts") === 11L)
    assert(out.getAs[Long]("span_minutes") === 6000L)
    assert(out.getAs[Long]("interval_minutes") === 1200L)
    assert(out.getAs[Timestamp]("next_due") ===
      Timestamp.valueOf(ts("2026-01-05 04:00:00").toLocalDateTime.plusMinutes(1200)))
  }

  test("clamping: hot sites floor at minMinutes, dead sites cap at maxMinutes") {
    val posts = Seq(
      // hot: 61 posts in one hour -> raw interval 30*60/60 = 30 min -> clamp 60
      (0 to 60).map(i => ("hot", Timestamp.valueOf(
        ts("2026-01-01 00:00:00").toLocalDateTime.plusMinutes(i.toLong)))),
      // dead: 2 posts a year apart -> raw interval huge -> clamp max
      Seq(("dead", ts("2025-01-01 00:00:00")), ("dead", ts("2026-01-01 00:00:00")))
    ).flatten.toDF("site_id", "created_at")
    val out = Recrawl.schedule(posts, "site_id", "created_at",
        targetBatch = 30, minMinutes = 60, maxMinutes = 7L * 24 * 60)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("interval_minutes")).toMap
    assert(out("hot") === 60L)
    assert(out("dead") === 7L * 24 * 60)
  }

  test("single-post site has zero span and schedules at minMinutes") {
    val posts = Seq(("s", ts("2026-01-01 00:00:00"))).toDF("site_id", "created_at")
    val out = Recrawl.schedule(posts, "site_id", "created_at", 30, 60, 10080).collect()(0)
    assert(out.getAs[Long]("span_minutes") === 0L)
    assert(out.getAs[Long]("interval_minutes") === 60L)
    assert(out.getAs[Timestamp]("next_due") === ts("2026-01-01 01:00:00"))
  }
}
