package graft.crawl

import graft.SparkSuite
import graft.operators.Spans
import org.apache.spark.sql.functions._

class RobotsSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("robots.txt parse: star group only, fractional crawl-delay, disallow prefixes") {
    val rules = Robots.parse("h.example",
      """# comment
        |User-agent: *
        |Crawl-delay: 0.3
        |Disallow: /private/
        |Disallow: /admin
        |
        |User-agent: BadBot
        |Disallow: /
        |""".stripMargin)
    assert(rules.crawl_delay_ms === 300)
    assert(rules.disallow === Seq("/private/", "/admin"))
    assert(Robots.allowed("/notice/1", rules.disallow))
    assert(!Robots.allowed("/private/trap", rules.disallow))
    assert(!Robots.allowed("/admin", rules.disallow))
  }

  test("fleet rules: every host has a delay; co-hosted sites collapse to one rule") {
    val rules = Robots.fleetRules
    assert(rules.map(_.host).distinct.size === rules.size)
    assert(rules.forall(_.crawl_delay_ms > 0))
    assert(rules.count(_.host == "cse.ssu.ac.kr") === 1)
  }
}

class RobotsCrawlSpec extends SparkSuite {

  test("disallowed trap links are filtered from the frontier before scheduling") {
    val r = Crawl.run(spark, Crawl.Config(scale = 200, limitPerSite = 50))
    val traps = r.schedule.filter(col("url").contains("/private/")).count()
    assert(traps === 0, "robots Disallow must drop trap links")
    // the traps WERE discovered (every 5th list page links one)
    val listPages = r.schedule.filter(col("page") >= 5).count()
    assert(listPages > 0)
  }
}

class PostSpansSpec extends SparkSuite {
  import spark.implicits._

  test("crawled posts decompose into interleaved spans (the input_hint invariant)") {
    val r = Crawl.run(spark, Crawl.Config(scale = 100, limitPerSite = 20))
    val spanRows = Spans.postsToSpanRows(r.posts).cache()

    // every post with a thumbnail has an image span carrying that media_ref
    val withThumb = r.posts.filter(col("thumbnail").isNotNull)
      .select(concat(col("site_id"), lit("#"), col("id")).as("doc_id"),
        col("thumbnail"))
    val imageSpans = spanRows.filter(col("kind") === "image")
      .select(col("doc_id"), col("media_ref"))
    val missing = withThumb.join(imageSpans,
      withThumb("doc_id") === imageSpans("doc_id") &&
        withThumb("thumbnail") === imageSpans("media_ref"), "left_anti").count()
    assert(missing === 0, "thumbnail must appear as an image span")

    // every post with attachments has attachment spans at the tail
    val attCount = r.posts.select(explode(col("attachments"))).count()
    assert(spanRows.filter(col("kind") === "attachment").count() === attCount)

    // per-doc offsets are 0..n-1 (dense, strictly ordered) — the
    // span-sequence invariant's order component
    val bad = spanRows.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("offset").as("mx"), min("offset").as("mn"),
        countDistinct("offset").as("nd"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1 || col("nd") =!= col("n"))
      .count()
    assert(bad === 0, "span offsets must be dense 0..n-1 per document")

    // decomposition is deterministic
    val again = Spans.postsToSpanRows(r.posts)
    val diff = spanRows.unionByName(again)
      .groupBy("doc_id", "kind", "text", "media_ref", "offset")
      .count().filter(col("count") =!= 2).count()
    assert(diff === 0, "span decomposition must be deterministic")
  }
}
