package graft.crawl

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Merge
import graft.sinks.{Report, Rss, SiteJson}

/**
 * The daemon run (reference entry point, packages/cli/src/main.rs:82-126):
 * crawl every site -> merge against the persistent cache -> newest-first
 * top-K per site -> JSON + RSS feeds + crawl report, plus the updated
 * cache snapshot (the next run's merge input).
 *
 * Spark shape (SURVEY.md §3.1): one job; stages split at the cache MERGE
 * (hash shuffle on (site_id, id)) and the per-site partitioned sinks.
 */
object Pipeline {

  final case class Output(
      topPosts: DataFrame, // top-K per site, output order
      cache: DataFrame,    // merged cache (next run input)
      siteJson: DataFrame,
      rss: DataFrame,
      events: DataFrame,
      schedule: DataFrame,
      lineage: DataFrame)

  def runDaemon(
      spark: SparkSession,
      cfg: Crawl.Config,
      cache: DataFrame,
      now: Timestamp,
      topK: Int = 100): Output = {

    val crawl = Crawl.run(spark, cfg)

    // arrival order of the new batch = crawl order (page, row) — join the
    // schedule (keyed by canonical url hash) to recover it
    val order = crawl.schedule
      .filter(col("site_id").isNotNull)
      .select(col("url"), ((col("page").cast("long") * 1000000L) + col("row")).as("seq"))
    val newPosts = crawl.posts.join(order, Seq("url"), "left")
      .withColumn("seq", coalesce(col("seq"), lit(0L)))

    val merged = Merge.mergeEntries(cache, newPosts, now)
    val top = Merge.topKPerSite(merged.posts, topK)

    Output(
      topPosts = top,
      cache = merged.posts,
      siteJson = SiteJson.perSite(top),
      rss = Rss.perSite(top),
      events = merged.events,
      schedule = crawl.schedule,
      lineage = crawl.lineage)
  }

  /** Empty cache with the Post+rank schema (first daemon run). */
  def emptyCache(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[graft.model.Post].toDF().withColumn("rank", lit(0L))
  }

  final case class CalendarOutput(events: DataFrame, cache: DataFrame, ics: String)

  /**
   * Calendar daemon path (reference run_calendar, core/mod.rs:219-267):
   * the calendar site's crawled posts become events, the cache is merged
   * replace-in-range, the in-range output renders to one ICS document.
   */
  def runCalendar(
      spark: SparkSession,
      crawledPosts: DataFrame,
      cache: DataFrame,
      start: java.sql.Timestamp,
      end: java.sql.Timestamp): CalendarOutput = {
    import spark.implicits._
    val events = crawledPosts
      .filter(col("site_id") === "ssu-academic-calendar")
      .select(
        col("id"), col("title"),
        lit(null).cast("string").as("description"),
        col("created_at").as("starts_at"),
        lit(null).cast("timestamp").as("ends_at"),
        lit(null).cast("string").as("location"),
        col("url"))
      // stable reference-style event id (M7)
      .withColumn("id", concat(lit("ssu-academic-calendar:"),
        date_format(col("starts_at"), "yyyy-MM-dd"), lit(":_:"),
        graft.functions.GraftFunctions.slugify(col("title"))))
    val merged = graft.operators.Merge.mergeCalendarReplaceInRange(cache, events, start, end)
    val output = graft.operators.Merge.calendarInRange(merged, start, end)
    val items = output.as[graft.model.CalendarEvent].collect().toSeq
    val ics = graft.sinks.Ics.toIcs(
      "SSU Academic Calendar", "https://scatch.ssu.ac.kr/학사일정", "학사일정", items)
    CalendarOutput(output, merged, ics)
  }
}
