package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

class WebSourceSpec extends SparkSuite {

  private def web = spark.read.format("graft.sources.WebSource")
    .option("scale", "200").option("limit_per_site", "50").load()

  test("reads the synthetic web as a DSv2 table") {
    val df = web
    assert(df.schema.fieldNames.toSeq ===
      Seq("site_id", "id", "url", "title", "created_at", "content"))
    val perSite = df.groupBy("site_id").count()
    assert(perSite.count() === 53) // post sites (calendar excluded)
    assert(perSite.agg(max("count")).collect()(0).getLong(0) <= 50)
  }

  test("site_id filter prunes whole sites at planning time") {
    val df = web.filter(col("site_id") === "biz.ssu.ac.kr")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("sites=biz.ssu.ac.kr"), plan.take(800))
    assert(df.select("site_id").distinct().count() === 1)
    // IN-list pushdown too
    val two = web.filter(col("site_id").isin("biz.ssu.ac.kr", "scatch.ssu.ac.kr"))
    assert(two.queryExecution.executedPlan.toString.contains("sites="))
    assert(two.select("site_id").distinct().count() === 2)
  }

  test("conjunctive site_id filters intersect instead of last-one-wins") {
    val df = web.filter(col("site_id") === "biz.ssu.ac.kr" &&
      col("site_id").isin("biz.ssu.ac.kr", "scatch.ssu.ac.kr"))
    val sites = df.select("site_id").distinct().collect().map(_.getString(0)).toSet
    assert(sites === Set("biz.ssu.ac.kr"))
    // contradictory constraints -> empty scan, not wrong rows
    val none = web.filter(col("site_id") === "biz.ssu.ac.kr" &&
      col("site_id") === "scatch.ssu.ac.kr")
    assert(none.count() === 0)
  }

  test("LIMIT pushes into the source: the page walk stops at the budget") {
    val df = web.limit(106)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedLimit=106"), plan.take(800))
    assert(df.count() === 106)
    // per-site cap = ceil(106/53) = 2 -> the source only ever fetches ~2/site
    val full = web.limit(106).groupBy("site_id").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(full <= 2)
  }

  test("rows match the crawl engine's fetch for the same site") {
    val viaSource = web.filter(col("site_id") === "biz.ssu.ac.kr")
      .select("id", "title").orderBy("id").collect().map(_.toString).toSeq
    val site = graft.crawl.SyntheticWeb.siteById("biz.ssu.ac.kr")
    val total0 = graft.crawl.Sites.postCount(site, 200)
    val visible = total0 - total0 / 23
    val expected = (0L until math.min(visible, 50L)).map { i =>
      val p = graft.crawl.SyntheticWeb.fetchPost(site, visible - i, 0,
        graft.crawl.Crawl.DefaultSeed)
      s"[${p.id},${p.title}]"
    }.sorted
    assert(viaSource === expected)
  }
}
