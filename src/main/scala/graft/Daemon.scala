package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.crawl.{Crawl, Pipeline}

/**
 * The daemon CLI — the spark-submit entry point mirroring the reference's
 * `cli::main` (packages/cli/src/main.rs:38-126):
 *
 *   spark-submit --class graft.Daemon \
 *     --conf spark.sql.extensions=graft.GraftExtensions ... \
 *     ssufidspark.jar --out /data/out --cache /data/cache \
 *       --limit 30 --scale 1000 [--include a.ssu.ac.kr,b.ssu.ac.kr | \
 *       --exclude c.ssu.ac.kr] [--rev 0] [--snapshot-dir /data/snap] \
 *       [--calendar-start 2026-01-01 --calendar-end 2027-12-31]
 *
 * Options mirror the reference: out/cache dirs, per-site limit (default
 * 100 = POST_COUNT_LIMIT, production 30), mutually exclusive
 * include/exclude site filters (main.rs:89-91 — realized as a broadcast
 * semi/anti join, J4), and the calendar crawl range (default this year
 * Jan 1 -> next year Dec 31, main.rs:268-277).
 *
 * Flow (main.rs:82-126): crawl all selected sites -> MERGE into the cache
 * -> newest-first top-K -> per-site JSON + RSS + calendar ICS + report,
 * then persist the new cache snapshot.
 */
object Daemon {

  final case class Options(
      out: String = "out",
      cache: String = "cache",
      limit: Long = 100L,
      scale: Long = 1000L,
      rev: Int = 0,
      include: Seq[String] = Seq.empty,
      exclude: Seq[String] = Seq.empty,
      snapshotDir: Option[String] = None,
      calendarStart: String = "2026-01-01",
      calendarEnd: String = "2027-12-31",
      now: Timestamp = Timestamp.valueOf("2026-01-15 00:00:00"))

  def parseArgs(args: Array[String]): Options = {
    var o = Options()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--out"            => o = o.copy(out = args(i + 1)); i += 2
        case "--cache"          => o = o.copy(cache = args(i + 1)); i += 2
        case "--limit"          => o = o.copy(limit = args(i + 1).toLong); i += 2
        case "--scale"          => o = o.copy(scale = args(i + 1).toLong); i += 2
        case "--rev"            => o = o.copy(rev = args(i + 1).toInt); i += 2
        case "--include"        => o = o.copy(include = args(i + 1).split(",").toSeq); i += 2
        case "--exclude"        => o = o.copy(exclude = args(i + 1).split(",").toSeq); i += 2
        case "--snapshot-dir"   => o = o.copy(snapshotDir = Some(args(i + 1))); i += 2
        case "--calendar-start" => o = o.copy(calendarStart = args(i + 1)); i += 2
        case "--calendar-end"   => o = o.copy(calendarEnd = args(i + 1)); i += 2
        case "--now"            => o = o.copy(now = Timestamp.valueOf(args(i + 1))); i += 2
        case other => throw new IllegalArgumentException(s"unknown option $other")
      }
    }
    require(o.include.isEmpty || o.exclude.isEmpty,
      "--include and --exclude are mutually exclusive (reference main.rs:89-91)")
    o
  }

  /** Site filter as a broadcast semi/anti join (J4, macros.rs:46-113). */
  def filterSites(spark: SparkSession, posts: DataFrame, opts: Options): DataFrame = {
    import spark.implicits._
    if (opts.include.nonEmpty)
      posts.join(broadcast(opts.include.toDF("site_id")), Seq("site_id"), "left_semi")
    else if (opts.exclude.nonEmpty)
      posts.join(broadcast(opts.exclude.toDF("site_id")), Seq("site_id"), "left_anti")
    else posts
  }

  def run(spark: SparkSession, opts: Options): Pipeline.Output = {
    import spark.implicits._
    // ONLY a missing path is a first run; corruption/permissions/IO errors
    // propagate (reference daemon read_cache special-cases NotFound only)
    val cache = graft.streaming.StreamingMerge.readSnapshotOr(spark, opts.cache)(
      Pipeline.emptyCache(spark))

    val cfg = Crawl.Config(scale = opts.scale, limitPerSite = opts.limit,
      rev = opts.rev, snapshotDir = opts.snapshotDir)
    val crawl = Crawl.run(spark, cfg)
    val selected = filterSites(spark, crawl.posts, opts)

    val order = crawl.schedule.select(col("url"),
      ((col("page").cast("long") * 1000000L) + col("row")).as("seq"))
    val newPosts = selected.join(order, Seq("url"), "left")
      .withColumn("seq", coalesce(col("seq"), lit(0L)))
    val merged = graft.operators.Merge.mergeEntries(cache, newPosts, opts.now)
    val top = graft.operators.Merge.topKPerSite(merged.posts, opts.limit.toInt)

    // sinks (cli main.rs:192-243 layout)
    graft.sinks.SiteJson.write(graft.sinks.SiteJson.perSite(top), s"${opts.out}/sites")
    graft.sinks.Rss.perSite(top).repartition(col("site_id"))
      .write.mode("overwrite").partitionBy("site_id").text(s"${opts.out}/rss")
    graft.sinks.Report.write(merged.events, s"${opts.out}/reports/content_report")
    crawl.lineage.write.mode("overwrite").json(s"${opts.out}/reports/lineage")

    // calendar path
    val calCache = graft.streaming.StreamingMerge.readSnapshotOr(
      spark, s"${opts.cache}_calendar")(
      spark.emptyDataset[graft.model.CalendarEvent].toDF())
    val cal = Pipeline.runCalendar(spark, crawl.posts, calCache,
      Timestamp.valueOf(s"${opts.calendarStart} 00:00:00"),
      Timestamp.valueOf(s"${opts.calendarEnd} 23:59:59"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(opts.out))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"${opts.out}/calendar.ics"), cal.ics)

    // persist next-run caches (snapshot-swap)
    merged.posts.write.mode("overwrite").parquet(s"${opts.cache}_next")
    cal.cache.write.mode("overwrite").parquet(s"${opts.cache}_calendar_next")

    Pipeline.Output(top, merged.posts, graft.sinks.SiteJson.perSite(top),
      graft.sinks.Rss.perSite(top), merged.events, crawl.schedule, crawl.lineage)
  }

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    val spark = SparkSession.builder()
      .appName("graft-daemon")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.registerAll(spark)
    val out = run(spark, opts)
    val created = out.events.filter(col("event") === "post_created").count()
    val updated = out.events.filter(col("event") === "post_updated").count()
    println(s"""{"posts": ${out.topPosts.count()}, "created": $created, "updated": $updated}""")
    spark.stop()
  }
}
