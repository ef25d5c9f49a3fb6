package graft.crawl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.GraftFunctions
import graft.model.Post

/**
 * The frontier scheduler: breadth-ordered crawl over the (synthetic) web,
 * generalizing the reference's per-site sequential crawl
 * (packages/cli/src/main.rs:110-114 all sites concurrent;
 * plugins/common/src/common/gnuboard/mod.rs:72-147 page walk + ordered
 * detail fan-out) to a 10^10-scale URL frontier.
 *
 * Per wave (one BFS depth level):
 *  1. canonicalize + hash every URL (codegen'd kernel expressions);
 *  2. in-wave dedup on url_hash (keep the breadth-first-smallest order key);
 *  3. seen-set filter: Bloom pre-filter + exact anti-join on the maybe
 *     slice ([[SeenSet.filterNew]]);
 *  4. politeness schedule: per-HOST virtual clock — the k-th fetch of a
 *     host is scheduled at (k-1) * crawl_delay(host) (robots-derived
 *     delays; reference precedent: fixed 300 ms,
 *     wordpress/mod.rs:146). Multiple sites on one host (cse/sw boards)
 *     share the bucket;
 *  5. salted repartition (host_hash, salt) of the fetch stage so a hot
 *     host (Zipf rank 1 = scatch) spreads across `numSalts` partitions
 *     instead of serializing on one — the salted-key priority queue.
 *     Priority = (depth, ready_ms, host, site, page, row), carried as
 *     explicit columns so order is independent of partitioning;
 *  6. fetch (deterministic synthetic expansion) -> docs + outlinks;
 *  7. per-partition lineage rows (partition id, watermark, counts).
 *
 * Determinism: every ordering is an explicit sort key; no
 * monotonically_increasing_id, no partition-order dependence — identical
 * output at local[8] and local[32] (asserted in CrawlSpec + Bench).
 *
 * Pagination: wave 0 fetches each site's page 1; the total page count is
 * probed from it (the reference's chemeng total-pages estimation,
 * lib.rs:341-372) and pages 2..P are scheduled in wave 1 — breadth-first,
 * NOT a sequential 2000-wave walk. `probePagination = false` reproduces
 * the strict sequential walk (gnuboard S1) for small fidelity tests.
 */
/** One output row of the fetch stage: a document or a discovered link. */
final case class ExpandRow(post: Option[Post], link: Option[SyntheticWeb.Req])

object Crawl {

  val DefaultSeed = 42L

  final case class Config(
      scale: Long = 1000L,
      limitPerSite: Long = 100L, // reference POST_COUNT_LIMIT (mod.rs:26)
      rev: Int = 0,
      numSalts: Int = 8,
      probePagination: Boolean = true,
      maxWaves: Int = 64,
      snapshotDir: Option[String] = None)

  final case class Result(
      posts: DataFrame,    // fetched documents (Post schema)
      seen: DataFrame,     // url_hash table
      schedule: DataFrame, // the crawl-order artifact
      lineage: DataFrame)  // per (wave, partition) lineage rows

  /** robots.txt fixture: crawl-delay per host (max over co-hosted sites). */
  def robots(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Sites.all.groupBy(_.host).map { case (h, ss) =>
      (h, ss.map(_.crawl_delay_ms).max)
    }.toSeq.toDF("host", "crawl_delay_ms")
  }

  def seeds(spark: SparkSession, cfg: Config): Dataset[SyntheticWeb.Req] = {
    import spark.implicits._
    val calendarYears = 2 // reference: this year + next (cli main.rs:268-277)
    val reqs = Sites.all.flatMap { s =>
      if (s.family == "calendar")
        (1 to calendarYears).map(y =>
          SyntheticWeb.Req(SyntheticWeb.listUrl(s, y), s.site_id, "list", y, 0, 0))
      else
        Seq(SyntheticWeb.Req(SyntheticWeb.listUrl(s, 1), s.site_id, "list", 1, 0, 0))
    }
    spark.createDataset(reqs).repartition(spark.sparkContext.defaultParallelism)
  }

  def run(spark: SparkSession, cfg: Config): Result = {
    import spark.implicits._
    runFrom(spark, cfg, seeds(spark, cfg).toDF(), wave0 = 0,
      seen0 = Seq.empty[(Long, Int)].toDF("url_hash", "first_wave"),
      posts0 = spark.emptyDataset[Post].toDF(),
      schedule0 = None, lineage0 = None)
  }

  /** Continue a crawl from an arbitrary state (used by snapshot resume). */
  def runFrom(
      spark: SparkSession, cfg: Config, frontier0: DataFrame, wave0: Int,
      seen0: DataFrame, posts0: DataFrame,
      schedule0: Option[DataFrame], lineage0: Option[DataFrame]): Result = {
    import spark.implicits._

    val robotsDf = broadcast(robots(spark))
    val emptySchedule = Seq.empty[(Int, String, String, String, Long, String, Int, Int, Int, Long, Int)]
      .toDF("wave", "host", "url", "canonical", "url_hash", "site_id", "page", "row", "depth",
        "ready_ms", "crawl_delay_ms")
    val emptyLineage = Seq.empty[(Int, Int, Long, Long, Long)]
      .toDF("wave", "partition_id", "scheduled", "deduped", "fetched")

    var frontier = frontier0
    var seen = seen0.persist(StorageLevel.MEMORY_AND_DISK)
    var seenCount = seen.count()
    var posts = posts0
    var schedule = schedule0.getOrElse(emptySchedule)
    var lineage = lineage0.getOrElse(emptyLineage)
    var wave = wave0

    while (wave < cfg.maxWaves && !frontier.isEmpty) {
      // 1. canonicalize + hash (codegen'd kernels)
      val keyed = frontier
        .withColumn("canonical", GraftFunctions.url_canonicalize(col("url")))
        .withColumn("url_hash", xxhash64(col("canonical")))
        .withColumn("host", GraftFunctions.url_host(col("url")))

      // 2. in-wave dedup: keep the breadth-smallest order key per url_hash
      val wDedup = Window.partitionBy("url_hash")
        .orderBy(col("depth"), col("site_id"), col("page"), col("row"))
      val inWave = keyed.withColumn("_rn", row_number().over(wDedup))
        .filter(col("_rn") === 1).drop("_rn")

      // 3. seen-set filter (bloom + exact anti-join)
      val fresh = SeenSet.filterNew(inWave, seen, "url_hash", seenCount)

      // 4. politeness: per-host virtual clock from robots crawl-delay
      val wHost = Window.partitionBy("host")
        .orderBy(col("depth"), col("site_id"), col("page"), col("row"))
      val scheduled = fresh.join(robotsDf, Seq("host"), "left")
        .withColumn("crawl_delay_ms", coalesce(col("crawl_delay_ms"), lit(300)))
        .withColumn("ready_ms",
          (row_number().over(wHost) - 1).cast("long") * col("crawl_delay_ms"))
        .withColumn("host_hash", xxhash64(col("host")))
        .withColumn("salt", pmod(col("url_hash"), lit(cfg.numSalts)))

      // 5. salted repartition for the fetch stage (defeats host skew)
      val parallelism = spark.sparkContext.defaultParallelism
      val fetchInput = scheduled.repartition(parallelism, col("host_hash"), col("salt"))
        .persist(StorageLevel.MEMORY_AND_DISK)

      val waveLineageBase = fetchInput.groupBy(spark_partition_id().as("partition_id"))
        .agg(count(lit(1)).as("fetched"))

      // 6. fetch = deterministic synthetic expansion (typed transform)
      val scale = cfg.scale; val limit = cfg.limitPerSite; val rev = cfg.rev
      val probe = cfg.probePagination
      val expanded = fetchInput
        .select("url", "site_id", "kind", "page", "row", "depth")
        .as[SyntheticWeb.Req]
        .flatMap { req =>
          val (post, links0) = SyntheticWeb.expand(req, scale, limit, rev)
          // pagination probe: from page 1, schedule ALL remaining pages
          val links =
            if (probe && req.kind == "list" && req.page == 1) {
              val nexts = links0.filter(_.kind == "list").flatMap { next =>
                val site = SyntheticWeb.siteById(req.site_id)
                val total0 = Sites.postCount(site, scale)
                val visible = if (rev >= 1) total0 else total0 - total0 / 23
                val wanted = math.min(visible, limit)
                val lastPage = ((wanted + site.page_size - 1) / site.page_size).toInt
                (next.page to lastPage).map(p =>
                  SyntheticWeb.Req(SyntheticWeb.listUrl(site, p), site.site_id, "list", p, 0,
                    next.depth))
              }
              links0.filter(_.kind == "post") ++ nexts
            } else links0
          (post.map(p => ExpandRow(Some(p), None)) ++
            links.map(l => ExpandRow(None, Some(l)))).iterator
        }
        .persist(StorageLevel.MEMORY_AND_DISK)

      val wavePosts = expanded.filter(_.post.isDefined).map(_.post.get).toDF()
      val nextFrontier = expanded.filter(_.link.isDefined).map(_.link.get).toDF()

      // 7. state updates + lineage
      val scheduledCount = keyed.count()
      val freshCount = fetchInput.count()
      val waveLineage = waveLineageBase
        .withColumn("wave", lit(wave))
        .withColumn("scheduled", lit(scheduledCount))
        .withColumn("deduped", lit(scheduledCount - freshCount))
        .select("wave", "partition_id", "scheduled", "deduped", "fetched")

      schedule = schedule.unionByName(
        scheduled.withColumn("wave", lit(wave)).select(
          "wave", "host", "url", "canonical", "url_hash", "site_id", "page", "row",
          "depth", "ready_ms", "crawl_delay_ms"))
      val newSeen = fetchInput.select(col("url_hash"), lit(wave).as("first_wave"))
      val prevSeen = seen
      seen = prevSeen.unionByName(newSeen).persist(StorageLevel.MEMORY_AND_DISK)
      seenCount = seen.count()
      posts = if (posts.isEmpty) wavePosts else posts.unionByName(wavePosts)
      lineage = lineage.unionByName(waveLineage)

      cfg.snapshotDir.foreach { dir =>
        Snapshots.write(spark, dir, wave, Map(
          "posts" -> posts, "seen" -> seen, "frontier" -> nextFrontier,
          "schedule" -> schedule, "lineage" -> lineage), cfg)
      }

      frontier = nextFrontier
      wave += 1
    }

    Result(posts, seen, schedule, lineage)
  }
}
