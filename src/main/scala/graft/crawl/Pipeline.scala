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
}
