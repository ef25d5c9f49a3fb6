package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

class WebSourceSpec extends SparkSuite {

  private def web = spark.read.format("graft.sources.WebSource")
    .option("scale", "200").option("limit_per_site", "50").load()

  test("reads the synthetic web as a DSv2 table (full post shape incl. media columns)") {
    val df = web
    assert(df.schema.fieldNames.toSeq ===
      Seq("site_id", "id", "url", "title", "created_at", "content",
        "thumbnail", "attachments"))
    val perSite = df.groupBy("site_id").count()
    assert(perSite.count() === 53) // post sites (calendar excluded)
    assert(perSite.agg(max("count")).collect()(0).getLong(0) <= 50)
    // media columns populated like the crawl's fetch: some thumbnails, some
    // typed attachments (the span/multimodal path can feed off the source)
    assert(df.filter(col("thumbnail").isNotNull).count() > 0)
    val att = df.filter(size(col("attachments")) > 0)
    assert(att.count() > 0)
    val a0 = att.select(col("attachments")(0).getField("mime_type")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(a0 === Set("application/x-hwp"))
  }

  test("column pruning reaches the reader: a narrow projection materializes only its fields") {
    val narrow = web.select("site_id", "title")
    val plan = narrow.queryExecution.executedPlan.toString
    assert(plan.contains("readColumns=site_id,title"), plan.take(900))
    assert(narrow.distinct().count() > 0)
    // pruned reads agree with the full-width read
    val wide = web.select("site_id", "title").collect().map(_.toString).sorted
    assert(narrow.collect().map(_.toString).sorted === wide)
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

  test("source-fed span decomposition equals crawl-fed spans for the same site and budget") {
    val siteId = "biz.ssu.ac.kr"
    val viaSource = graft.operators.Spans.postsToSpanRows(
      web.filter(col("site_id") === siteId))
    val crawl = graft.crawl.Crawl.run(spark,
      graft.crawl.Crawl.Config(scale = 200, limitPerSite = 50, include = Seq(siteId)))
    val viaCrawl = graft.operators.Spans.postsToSpanRows(crawl.posts)
    val k = Seq("doc_id", "kind", "text", "media_ref", "offset")
    assert(viaSource.select(k.map(col): _*).collect().map(_.toString).sorted.toSeq ===
      viaCrawl.select(k.map(col): _*).collect().map(_.toString).sorted.toSeq)
  }

  test("rows match the crawl engine's fetch for the same site") {
    val viaSource = web.filter(col("site_id") === "biz.ssu.ac.kr")
      .select("id", "title").orderBy("id").collect().map(_.toString).toSeq
    val site = graft.crawl.SyntheticWeb.siteById("biz.ssu.ac.kr")
    val total0 = graft.crawl.Sites.postCount(site, 200)
    val visible = total0 - total0 / 23
    val expected = (0L until math.min(visible, 50L)).map { i =>
      val p = graft.crawl.SyntheticWeb.fetchPost(site,
        graft.crawl.SyntheticWeb.idAt(total0, i, 0), 0,
        graft.crawl.Crawl.DefaultSeed)
      s"[${p.id},${p.title}]"
    }.sorted
    assert(viaSource === expected)
  }
}
