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
 * Pagination: with `probePagination` (default) the page count per site is
 * computed up front and ALL list pages are seeded at wave 0 (reference
 * precedent: ssucatch static fan-out S3, chemeng total-pages probe A3), so
 * the crawl is exactly two breadth levels — lists, then posts — instead of
 * a sequential page-chain of waves. `probePagination = false` reproduces
 * the strict sequential walk (gnuboard S1) for small fidelity tests.
 *
 * robots.txt: per-host rules are parsed from the synthetic bodies
 * ([[Robots]]) — Crawl-delay feeds the politeness clock, Disallow filters
 * the frontier before any scheduling work.
 */
/** One output row of the fetch stage: a document or a discovered link. */
final case class ExpandRow(post: Option[Post], link: Option[SyntheticWeb.Req])

/** A frontier row entering the fused dedup+politeness pass. */
final case class WaveRow(site_id: String, kind: String, page: Int, row: Int,
    depth: Int, crawl_delay_ms: Int, url_hash: Long, host_hash: Long)

/** A scheduled row leaving the fused pass (politeness clock assigned).
  * No `url` field: the URL string is grammar-derived from the coordinates
  * ([[UrlGrammar]]), so the dedup+politeness exchange and the salted
  * write exchange move 8-byte hashes and small ints instead of the
  * 60-90-byte URL string — it is re-materialized in the write projection. */
final case class RankedRow(site_id: String, kind: String, page: Int, row: Int,
    depth: Int, crawl_delay_ms: Int, url_hash: Long, host_hash: Long, ready_ms: Long)

/**
 * JVM-wide registry of transient crawl work dirs, reclaimed by ONE shutdown
 * hook (registering a hook per Crawl.run would accumulate threads in
 * long-lived sessions). Deletion walks depth-first with the directory
 * stream closed eagerly (Files.walk in try/finally — Files.list left open
 * leaks an fd per directory during the recursive delete).
 */
private[graft] object TempDirs {
  private val dirs = java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()
  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(new Thread(() => {
    dirs.forEach { dir =>
      try {
        val walk = java.nio.file.Files.walk(dir)
        try {
          walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
        } finally walk.close()
      } catch { case _: Throwable => () }
    }
  }))
  def register(dir: java.nio.file.Path): Unit = { hook; dirs.add(dir); () }
}

object Crawl {

  val DefaultSeed = 42L

  final case class Config(
      scale: Long = 1000L,
      limitPerSite: Long = 100L, // reference POST_COUNT_LIMIT (mod.rs:26)
      rev: Int = 0,
      numSalts: Int = 8,
      probePagination: Boolean = true,
      maxWaves: Int = 64,
      snapshotDir: Option[String] = None,
      seenSketch: String = "bloom", // "bloom" | "cuckoo"
      // seed lists are distinct by construction (one URL per (site, page))
      // — skip the wave-0 in-wave dedup shuffle; set false for seed sources
      // that may repeat URLs
      seedsDistinct: Boolean = true,
      // Deterministic fetch-fault injection for the synthetic web:
      // ((site_id, wave) -> number of attempts that fail). The reference
      // tests inject failing plugins the same way to drive run_with_retry
      // (mod.rs:38-93 + the gnuboard try_collect whole-plugin retry,
      // gnuboard mod.rs:76-81). Non-empty faults switch the fetch stage to
      // per-site materialized slices wrapped in whole-site Retry.
      faults: Map[(String, Int), Int] = Map.empty,
      // Live pacing: route the fetch stage through the ThrottledFetch
      // token bucket (real wall-clock politeness + real SSO sessions)
      // instead of the virtual-clock schedule alone. Off by default —
      // the no-network sandbox needs no wall-clock pacing; the spec
      // drives it with numSalts=1 for strict per-host spacing.
      livePacing: Boolean = false,
      // Site selection BEFORE any scheduling work — the reference prunes
      // plugins before task creation (cli macros.rs:46-113): an unselected
      // site contributes zero seeds, zero fetches, zero shuffle rows.
      include: Seq[String] = Seq.empty,
      exclude: Seq[String] = Seq.empty)

  final case class Result(
      posts: DataFrame,    // fetched documents (Post schema)
      seen: DataFrame,     // url_hash table
      schedule: DataFrame, // the crawl-order artifact
      lineage: DataFrame,  // per (wave, partition) lineage rows
      // SSO bootstrap counter (S8): one init per partition×host that
      // touches an auth-family site — NOT one per fetched row
      ssoBootstraps: org.apache.spark.util.LongAccumulator = null,
      // sites whose fetch stage exhausted whole-site retries mid-crawl
      // (reference error tally, cli main.rs:118-125): their posts are
      // excluded from the run's output, the daemon reports crawl_failed
      failedSites: Map[String, Throwable] = Map.empty,
      // live-pacing audit trail: one (host, started_at_ms, wave) row per
      // fetch — empty unless Config.livePacing
      fetchLog: DataFrame = null)

  /**
   * Per-partition fetch expansion shared by the batch waves and the
   * streaming crawl: lazy once-per-host SSO bootstrap for auth-family
   * sites (S8), then the deterministic synthetic fetch. `faultCheck` is
   * the executor-side fault-injection hook (throws to simulate a failed
   * fetch — a task failure that fails the site's whole slice, like a
   * failed HTTP request fails the reference's whole plugin attempt).
   */
  /** Expand ONE request with an already-resolved session provider — the
    * single expansion used by the batch fetch stage AND the live-pacing
    * path (so probe/link semantics can never diverge between the two). */
  private[graft] def expandOne(
      req: SyntheticWeb.Req, scale: Long, limit: Long, rev: Int, probe: Boolean,
      sessionFor: String => Sso.Session): (Option[Post], Seq[SyntheticWeb.Req]) = {
    val site = SyntheticWeb.siteById(req.site_id)
    val session = if (site.family == "auth") Some(sessionFor(site.host)) else None
    val (post, links0) = SyntheticWeb.expand(req, scale, limit, rev, session)
    // with the static pagination fan-out, list pages were all seeded at
    // wave 0 — drop the rediscovered next-page links (they are in the
    // seen set anyway; this just avoids scheduling work)
    (post, if (probe) links0.filter(_.kind != "list") else links0)
  }

  private[graft] def expandPartition(
      it: Iterator[SyntheticWeb.Req], scale: Long, limit: Long, rev: Int,
      probe: Boolean, onBootstrap: () => Unit,
      faultCheck: SyntheticWeb.Req => Unit = _ => ()): Iterator[ExpandRow] = {
    val sessions = scala.collection.mutable.HashMap.empty[String, Sso.Session]
    val sessionFor: String => Sso.Session =
      host => sessions.getOrElseUpdate(host, { onBootstrap(); Sso.bootstrap(host) })
    it.flatMap { req =>
      faultCheck(req)
      val (post, links) = expandOne(req, scale, limit, rev, probe, sessionFor)
      (post.map(p => ExpandRow(Some(p), None)) ++
        links.map(l => ExpandRow(None, Some(l)))).iterator
    }
  }

  /** robots rules per host (parsed from the synthetic robots.txt bodies):
    * crawl-delay feeds the politeness clock; Disallow prefixes filter the
    * frontier. Co-hosted sites share one bucket (max delay wins). */
  def robots(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Robots.fleetRules.map(r => (r.host, r.crawl_delay_ms, r.disallow))
      .toDF("host", "crawl_delay_ms", "disallow")
  }

  def seeds(spark: SparkSession, cfg: Config): Dataset[SyntheticWeb.Req] = {
    import spark.implicits._
    val calendarYears = 2 // reference: this year + next (cli main.rs:268-277)
    val scale = cfg.scale; val limit = cfg.limitPerSite; val rev = cfg.rev
    val probe = cfg.probePagination
    val siteSeeds = spark.createDataset(Sites.selected(cfg.include, cfg.exclude))
    siteSeeds.flatMap { s =>
      if (s.family == "calendar")
        (1 to calendarYears).map(y =>
          SyntheticWeb.Req(SyntheticWeb.listUrl(s, y), s.site_id, "list", y, 0, 0))
      else if (probe) {
        // static pagination fan-out: the page count is computable up front
        // (reference precedent: ssucatch page fan-out S3,
        // plugins/ssucatch/src/lib.rs:261-295, and chemeng total-pages
        // probe A3, lib.rs:341-372) — every list page is a seed, keeping
        // the crawl at two breadth levels (lists, then posts)
        val total0 = Sites.postCount(s, scale)
        val visible = if (rev >= 1) total0 else total0 - total0 / 23
        val wanted = math.min(visible, limit)
        val lastPage = math.max(1L, (wanted + s.page_size - 1) / s.page_size).toInt
        (1 to lastPage).map(p =>
          SyntheticWeb.Req(SyntheticWeb.listUrl(s, p), s.site_id, "list", p, 0, 0))
      } else
        Seq(SyntheticWeb.Req(SyntheticWeb.listUrl(s, 1), s.site_id, "list", 1, 0, 0))
    }.repartition(spark.sparkContext.defaultParallelism)
  }

  def run(spark: SparkSession, cfg: Config): Result = {
    import spark.implicits._
    runFrom(spark, cfg, seeds(spark, cfg).toDF(), wave0 = 0,
      seen0 = Seq.empty[(Long, Int)].toDF("url_hash", "first_wave"),
      posts0 = spark.emptyDataset[Post].toDF(),
      schedule0 = None, lineage0 = None)
  }

  /** Continue a crawl from an arbitrary state (used by snapshot resume).
    * `failures0` carries a resumed snapshot's recorded mid-crawl failures
    * forward so the resumed run still reports (and keeps excluding) them. */
  def runFrom(
      spark: SparkSession, cfg: Config, frontier0: DataFrame, wave0: Int,
      seen0: DataFrame, posts0: DataFrame,
      schedule0: Option[DataFrame], lineage0: Option[DataFrame],
      failures0: Map[String, Throwable] = Map.empty): Result = {
    import spark.implicits._

    val robotsDf = broadcast(robots(spark))
    val ssoBootstraps = spark.sparkContext.longAccumulator("sso_bootstraps")
    // wave stage-out root: the snapshot dir when snapshotting, else a temp
    // (tmpfs when available — wave files are transient and RAM-backed
    // stage-out removes disk-IO jitter; a cluster would use HDFS/S3 here)
    val workDir = cfg.snapshotDir.getOrElse {
      val shm = java.nio.file.Paths.get("/dev/shm")
      val base = if (java.nio.file.Files.isWritable(shm)) shm
                 else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
      val dir = java.nio.file.Files.createTempDirectory(base, "graft-crawl-")
      // transient stage-out is reclaimed at JVM exit — result DataFrames
      // lazily re-read these files for the session's lifetime, so earlier
      // deletion would break downstream consumers; without the cleanup
      // every crawl leaks its wave files into tmpfs
      TempDirs.register(dir)
      dir.toString
    }
    val emptySchedule = Seq.empty[(Int, String, String, String, Long, String, Int, Int, Int, Long, Int)]
      .toDF("wave", "host", "url", "canonical", "url_hash", "site_id", "page", "row", "depth",
        "ready_ms", "crawl_delay_ms")
    val emptyLineage = Seq.empty[(Int, Int, Long, Long, Long)]
      .toDF("wave", "partition_id", "scheduled", "deduped", "fetched")

    // the frontier is url-free inside the wave loop (UrlGrammar derives
    // the string from coordinates at the consumption edges); dropping the
    // column here normalizes every entry path — fresh seeds (which carry
    // the Req url) and resumed snapshots (already url-free) alike
    var frontier = frontier0.drop("url")
    // Growing state is kept as PARTS (one persisted DataFrame per wave) and
    // unioned once at the end: rebuilding a growing union tree inside the
    // loop makes Catalyst/AQE re-plan an ever-larger plan every wave — a
    // serial driver cost that destroys N->4N scaling efficiency.
    val seenParts = scala.collection.mutable.ArrayBuffer(
      seen0.persist(StorageLevel.MEMORY_AND_DISK))
    val postParts = scala.collection.mutable.ArrayBuffer(posts0)
    val scheduleParts = scala.collection.mutable.ArrayBuffer(
      schedule0.getOrElse(emptySchedule))
    val lineageParts = scala.collection.mutable.ArrayBuffer(
      lineage0.getOrElse(emptyLineage))
    def seenAll = seenParts.reduce(_ unionByName _)
    var seenCount = seenParts.head.count()
    // incrementally-maintained seen sketch: each wave folds its fresh delta
    // in (O(|delta|)) instead of re-aggregating the whole seen set
    // (O(|seen|) per wave — a full-state scan per wave at 10^10 URLs)
    val sketch = new SeenSet.IncrementalSketch(cfg.seenSketch,
      initialCapacity = seenCount * 4)
    if (seenCount > 0) sketch.add(seenParts.head, seenCount, "url_hash")(seenAll)
    var wave = wave0
    // frontier size is carried between waves (the producer counted it) —
    // no extra action per wave just to test emptiness
    var frontierCount = frontier.count()

    require(!cfg.livePacing || cfg.faults.isEmpty,
      "livePacing and fault injection are separate test modes")
    val midCrawlFailures = scala.collection.mutable.LinkedHashMap.empty[String, Throwable]
    midCrawlFailures ++= failures0
    // A failed site contributes NO rows to persisted/returned posts — its
    // earlier-wave fetches happened, but the reference's failed plugin
    // yields an error, not partial output (mod.rs:38-93).
    def excludeFailedSites(posts: DataFrame): DataFrame =
      if (midCrawlFailures.isEmpty) posts
      else posts.filter(!col("site_id").isin(midCrawlFailures.keys.toSeq: _*))
    // The seen table carries only url_hash — recover the failed sites'
    // hashes from the schedule (every seen hash has a schedule row) and
    // anti-join them out, so a resume / the next run re-schedules them.
    // Bounded by the failed sites' slice, and only runs on failure.
    def excludeFailedSeen(seen: DataFrame,
        schedParts: scala.collection.Seq[DataFrame]): DataFrame =
      if (midCrawlFailures.isEmpty) seen
      else {
        val failedHashes = schedParts.reduce(_ unionByName _)
          .filter(col("site_id").isin(midCrawlFailures.keys.toSeq: _*))
          .select("url_hash").distinct()
        seen.join(failedHashes, Seq("url_hash"), "left_anti")
      }
    val fetchLogParts = scala.collection.mutable.ArrayBuffer(
      Seq.empty[(String, Long, Int)].toDF("host", "started_at_ms", "wave"))
    val debug = sys.env.get("SPARK_GRAFT_CRAWL_DEBUG").contains("1")
    def tick[T](label: String, wv: Int)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      if (debug) System.err.println(f"[crawl] w$wv $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    while (wave < cfg.maxWaves && frontierCount > 0) {
      // a site that already exhausted its retries fetches nothing further
      // this run (the reference drops the failed plugin for the whole run)
      // — its leftover frontier rows are pruned before any scheduling work
      val frontierLive =
        if (midCrawlFailures.isEmpty) frontier
        else frontier.filter(!col("site_id").isin(midCrawlFailures.keys.toSeq: _*))
      // 1. re-materialize the URL from its grammar coordinates (the
      //    frontier persists/shuffles only (site_id, kind, page, row,
      //    depth) — see UrlGrammar), then canonicalize + hash (codegen'd
      //    kernels), join robots rules (broadcast) and enforce Disallow
      //    BEFORE any scheduling work. Only the 8-byte HASH of the
      //    canonical form travels through the wave's shuffles — the
      //    canonical string itself is recomputed by the (parallel,
      //    codegen'd) kernel at stage-out time: shuffle bytes are the
      //    contended resource, per-row CPU is not.
      val keyed = frontierLive
        .withColumn("url", UrlGrammar.rebuild_url(col("site_id"), col("kind"),
          col("page"), col("row"), cfg.scale, cfg.rev))
        .withColumn("url_hash", xxhash64(GraftFunctions.url_canonicalize(col("url"))))
        .withColumn("host", GraftFunctions.url_host(col("url")))
        .join(robotsDf, Seq("host"), "left")
        .withColumn("crawl_delay_ms", coalesce(col("crawl_delay_ms"), lit(300)))
        .filter(coalesce(!exists(col("disallow"),
          d => GraftFunctions.url_path(col("url")).startsWith(d)), lit(true)))
        .drop("disallow")
        // like `canonical`, the host STRING is recomputed at stage-out; only
        // its 8-byte hash travels through the wave's shuffles (the window
        // groups by host_hash — 64-bit collisions across a host fleet are
        // negligible, and the politeness spec verifies per-host spacing on
        // the reconstructed column)
        .withColumn("host_hash", xxhash64(col("host")))
        .drop("host")

      // fetch-stage task count follows the session's reducer knob (finer
      // than core count so stragglers overlap), not the raw core count
      val parallelism = spark.conf.get("spark.sql.shuffle.partitions").toInt
      // Scale-adaptive partition counts (guide §2.5/§6): the wave's task
      // count follows the WAVE SIZE (frontierCount is already known — the
      // producer counted it), capped at the core-derived counts so
      // big-crawl plans are byte-identical to before. Without the floor a
      // 3k-row daemon crawl fans out 128 politeness tasks + 96 writer
      // tasks per wave — pure scheduler overhead and a 96-file stage-out
      // for a wave that fits one task.
      val rowsPerTask = sys.props.get("graft.rows.per.task")
        .orElse(sys.env.get("SPARK_GRAFT_ROWS_PER_TASK")).getOrElse("8192").toLong
      def adaptiveParts(cap: Int): Int =
        math.max(1L, math.min(cap.toLong,
          (frontierCount + rowsPerTask - 1) / rowsPerTask)).toInt

      // 2-4. in-wave dedup (breadth-smallest order key per url_hash) +
      // seen-set filter + politeness clock. Strategies via SPARK_GRAFT_DEDUP:
      //  - "fused" (default): seen-filter first (Bloom prefilter: the big
      //    slice never joins), then ONE exchange clusters each host's rows —
      //    duplicates of a URL always share the host, so a single sorted
      //    per-partition pass does the exact dedup AND assigns the per-host
      //    politeness rank. One wave exchange + one local sort where the
      //    split strategies pay two of each (dedup shuffle + window
      //    exchange) — shuffle bytes are the scaling-limited resource;
      //  - "window": dedup via row_number over a url_hash window, then the
      //    separate host window (the round-1 shape, kept for A/B);
      //  - "minby": dedup via hash aggregation with map-side combine — wins
      //    when duplicate discovery is common (the real-web case), as dupes
      //    collapse before the shuffle.
      val keyedCols = keyed.columns
      val dedupStrategy = sys.env.getOrElse("SPARK_GRAFT_DEDUP", "fused")
      val scheduled =
        if (dedupStrategy == "fused") {
          val fresh0 = tick("sketch+filterNew(build)", wave)(
            SeenSet.filterNewProbe(keyed, seenAll, "url_hash",
              sketch.probe(col("url_hash"))))
          fresh0.select(col("site_id"), col("kind"), col("page"), col("row"),
              col("depth"), col("crawl_delay_ms"), col("url_hash"), col("host_hash"))
            .as[WaveRow]
            // finer than the reducer knob: a host cannot split across
            // partitions (the politeness rank needs the host contiguous),
            // so the hot host is a fixed-size task — smaller sibling tasks
            // let the scheduler overlap it instead of idling at the barrier
            .repartition(adaptiveParts(parallelism * 4), col("host_hash"))
            .sortWithinPartitions(col("host_hash"), col("depth"), col("site_id"),
              col("page"), col("row"), col("url_hash"))
            .mapPartitions { it =>
              // hosts are hash-disjoint across partitions and contiguous
              // after the sort: the dedup set resets per host, so memory is
              // bounded by the hottest host's wave slice (8 B per URL)
              val seenUrl = new java.util.HashSet[java.lang.Long]()
              var curHost = 0L
              var rank = 0L
              var started = false
              it.flatMap { r =>
                if (!started || r.host_hash != curHost) {
                  curHost = r.host_hash; rank = 0L; seenUrl.clear(); started = true
                }
                if (seenUrl.add(r.url_hash)) {
                  val out = RankedRow(r.site_id, r.kind, r.page, r.row, r.depth,
                    r.crawl_delay_ms, r.url_hash, r.host_hash,
                    rank * r.crawl_delay_ms)
                  rank += 1
                  Some(out)
                } else None
              }
            }
            .toDF()
            .withColumn("salt", pmod(col("url_hash"), lit(cfg.numSalts)))
        } else {
          val inWave =
            if (wave == 0 && cfg.seedsDistinct) {
              // the seed wave is distinct BY CONSTRUCTION (one URL per
              // (site, page); distinct sites have distinct base URLs)
              keyed
            } else if (dedupStrategy == "window") {
              val wDedup = Window.partitionBy("url_hash")
                .orderBy(col("depth"), col("site_id"), col("page"), col("row"))
              keyed.withColumn("_rn", row_number().over(wDedup))
                .filter(col("_rn") === 1).drop("_rn")
            } else keyed
              .groupBy("url_hash")
              .agg(min_by(
                struct(keyedCols.filter(_ != "url_hash").map(col): _*),
                struct(col("depth"), col("site_id"), col("page"), col("row"))).as("_r"))
              .select(col("url_hash") +: keyedCols.filter(_ != "url_hash")
                .map(c => col(s"_r.$c").as(c)): _*)
          val fresh = tick("sketch+filterNew(build)", wave)(
            SeenSet.filterNewProbe(inWave, seenAll, "url_hash",
              sketch.probe(col("url_hash"))))
          val wHost = Window.partitionBy("host_hash")
            .orderBy(col("depth"), col("site_id"), col("page"), col("row"))
          fresh
            .withColumn("ready_ms",
              (row_number().over(wHost) - 1).cast("long") * col("crawl_delay_ms"))
            .withColumn("salt", pmod(col("url_hash"), lit(cfg.numSalts)))
            // uniform url-free schedule schema: the write projection below
            // re-materializes the URL for every strategy
            .drop("url")
        }

      // 5. salted repartition for the fetch stage (defeats host skew — the
      // window's by-host exchange leaves the hot host in one partition, so
      // writing directly from it would skew both the parquet encode and the
      // read-back), then ONE streaming pass stages the wave out to columnar
      // storage (parquet). Wide rows are never cached in memory: the
      // in-memory columnar cache build cost ~3x the compute at 10^6 rows
      // and is pure GC pressure at 10^10 — stage-out to storage is the
      // 100 TB design, and every downstream consumer (counts, seen-set,
      // lineage, the fetch stage itself) reads the columnar file back.
      // derivable columns (canonical = url_canonicalize(url), host =
      // url_host(url)) are NOT stored: the codegen'd kernels recompute them
      // lazily at read time, so the wave file carries one URL string
      // instead of three — fewer parquet bytes through the (memory-
      // bandwidth-contended) stage-out, and consumers that never touch
      // them (the fetch stage prunes to url/site/kind/page/row/depth)
      // never pay for them at all
      val wavePath = s"$workDir/waves/w$wave/schedule"
      // A/B knob: the salted write exchange spreads the hot host's rows
      // across writers (Zipf rank-1 is a ~25% single-task straggler
      // without it); =0 writes straight from the fused layout
      val saltedWrite = !sys.env.get("SPARK_GRAFT_SALTED_WRITE").contains("0")
      // finer-than-core write tasks: (host, salt) groups are few enough at
      // fleet scale that hashing them into exactly `cores` buckets leaves
      // visible imbalance; 3x gives the scheduler room to overlap without
      // shrinking row groups much (quiet-window A/B at N=2/8: 3x edged 2x
      // on both wall and cpu at 8 cores, flat at 2)
      val writeParts = adaptiveParts(parallelism *
        sys.env.getOrElse("SPARK_GRAFT_WRITE_PARTS", "3").toInt)
      tick("stageout.write", wave) {
        (if (saltedWrite)
          scheduled.repartition(writeParts, col("host_hash"), col("salt"))
        else scheduled)
          // coordinates only: like `canonical`/`host` (and like the
          // exchanges above), the wave FILE does not store the URL
          // string either — at scale 1M the big-wave stage-out parquet
          // drops 93 → 55 MB (the residue is the incompressible 8-byte
          // url/host hashes), the dominant wave-write cost. Consumers
          // re-derive url/canonical/host from the grammar kernel at
          // read time (fetchInput below); the PERSISTED
          // schedule/snapshot artifacts still materialize the URL.
          .withColumn("partition_id", spark_partition_id())
          .write.mode("overwrite")
          // wave files are transient single-reader stage-out; pinned A/B at
          // N=2/N=8 over snappy/lz4/none showed lz4 ~15% slower and
          // snappy vs none within host noise — keep the parquet default,
          // expose the knob for cluster-specific tuning
          .option("compression", sys.env.getOrElse("SPARK_GRAFT_WAVE_CODEC", "snappy"))
          // dictionary encoding was OFF while the unique URL strings rode
          // in this file (dict hashing on never-repeating values is pure
          // LLC pressure); with the file now coordinates-only its string
          // columns (site_id, kind) have 54/2 distinct values — exactly
          // what dictionary encoding is for, so the parquet default is
          // back on (knob retained for A/B)
          .option("parquet.enable.dictionary",
            sys.env.getOrElse("SPARK_GRAFT_WAVE_DICT", "true"))
          // hive-style wave=N leaf dir: the wave number rides as a
          // PARTITION column on read-back instead of a `lit(wave)` in the
          // write projection — an int literal is inlined into the
          // generated code, so every wave used to Janino-compile a fresh
          // write-stage class (same machine code, different constant);
          // with the constant in the directory name the projection source
          // is wave-invariant and every wave of every crawl in a session
          // shares one compiled class. Value-identical: partition
          // inference types `wave=N` as the same IntegerType the literal
          // had.
          .parquet(s"$wavePath/wave=$wave")
      }
      val staged = spark.read.parquet(wavePath)
      val fetchInput = staged
        // the URL string re-enters HERE, at read time (one grammar-kernel
        // evaluation per consuming projection — per-row CPU in parallel
        // stages, traded for the dominant stage-out write/read bytes)
        .withColumn("url", UrlGrammar.rebuild_url(col("site_id"), col("kind"),
          col("page"), col("row"), cfg.scale, cfg.rev))
        .withColumn("canonical", GraftFunctions.url_canonicalize(col("url")))
        .withColumn("host", GraftFunctions.url_host(col("url")))

      val waveLineageBase = fetchInput.groupBy(col("partition_id"))
        .agg(count(lit(1)).as("fetched"))

      // 6. fetch = deterministic synthetic expansion (typed transform).
      // Auth-family (SSO) sites need a bootstrapped session: init ONCE PER
      // PARTITION per host inside mapPartitions (S8, sso.rs:26-92 — the
      // authenticated client is constructed once and reused), counted by an
      // accumulator so the spec can assert inits << fetches.
      val scale = cfg.scale; val limit = cfg.limitPerSite; val rev = cfg.rev
      val probe = cfg.probePagination
      val faults = cfg.faults; val wv = wave
      def expandDs(input: DataFrame, attempt: Int): Dataset[ExpandRow] = input
        .select("url", "site_id", "kind", "page", "row", "depth")
        .as[SyntheticWeb.Req]
        .mapPartitions(it =>
          expandPartition(it, scale, limit, rev, probe, () => ssoBootstraps.add(1L),
            req => if (faults.getOrElse((req.site_id, wv), 0) > attempt)
              throw new RuntimeException(
                s"synthetic fetch failure: ${req.site_id} wave=$wv attempt=$attempt")))
      // Mid-crawl WHOLE-SITE retry (reference run_with_retry around the
      // whole plugin attempt, mod.rs:38-93; a failed detail fetch retries
      // the site from scratch, gnuboard mod.rs:76-81 try_collect). The
      // fast path (no faults configured) keeps the single lazy fetch
      // stage; with faults the wave's fetch runs as per-site materialized
      // slices so one site's failure neither poisons nor re-runs its
      // siblings. Re-fetch is idempotent: the expansion is deterministic
      // and the seen-set/merge tolerate at-least-once delivery, so a
      // fail-then-succeed site yields byte-identical output (CrawlSpec).
      val expanded: Dataset[ExpandRow] =
        if (cfg.livePacing) {
          // LIVE politeness: the wave's fetch runs through the token-bucket
          // executor — real wall-clock spacing per host within each salt
          // lane (numSalts=1 => strict per-host pacing), real lazy SSO
          // sessions (one bootstrap per task×host). The paced result is
          // staged out ONCE so downstream consumers re-read files instead
          // of re-triggering paced fetches.
          val delays: Map[String, Long] =
            Robots.fleetRules.map(r => r.host -> r.crawl_delay_ms.toLong).toMap
          val reqs = fetchInput
            .select("url", "site_id", "kind", "page", "row", "depth")
            .as[SyntheticWeb.Req]
          val fetched = ThrottledFetch.run[
              SyntheticWeb.Req, (Option[Post], Seq[SyntheticWeb.Req])](
            reqs,
            hostOf = r => SyntheticWeb.siteById(r.site_id).host,
            delayMsFor = h => delays.getOrElse(h, 300L),
            // the SAME expansion as the batch fetch stage (expandOne), and
            // the same bootstrap accounting — live mode must not diverge
            fetch = (req, sessionFor) =>
              expandOne(req, scale, limit, rev, probe, sessionFor),
            onBootstrap = () => ssoBootstraps.add(1L))
          val path = s"$workDir/waves/w$wave/fetched"
          fetched.toDF().write.mode("overwrite").parquet(path)
          val f = spark.read.parquet(path)
          fetchLogParts += f
            .select(col("host"), col("startedAtMs").as("started_at_ms"))
            .withColumn("wave", lit(wv))
          f.as[ThrottledFetch.Fetched[(Option[Post], Seq[SyntheticWeb.Req])]]
            .flatMap { fr =>
              fr.result._1.map(p => ExpandRow(Some(p), None)).toSeq ++
                fr.result._2.map(l => ExpandRow(None, Some(l)))
            }
        } else if (faults.isEmpty) expandDs(fetchInput, 0)
        else {
          val sites = fetchInput.select("site_id").distinct().as[String].collect().sorted
          val okParts = scala.collection.mutable.ArrayBuffer.empty[String]
          sites.foreach { sid =>
            val p = s"$workDir/waves/w$wave/expand/" +
              java.net.URLEncoder.encode(sid, "UTF-8")
            try {
              Retry.withRetry(3) { attempt =>
                expandDs(fetchInput.filter(col("site_id") === sid), attempt)
                  .toDF().write.mode("overwrite").parquet(p)
              }
              okParts += p
            } catch {
              case e: Retry.RetryExhausted => midCrawlFailures(sid) = e
            }
          }
          if (okParts.isEmpty) spark.emptyDataset[ExpandRow]
          else spark.read.parquet(okParts.toSeq: _*).as[ExpandRow]
        }

      // The wave's documents stay LAZY views over the persisted fetchInput —
      // caching a million Post rows per wave is pure GC pressure, and
      // downstream consumers (merge, snapshots) recompute the cheap expand
      // from the persisted inputs instead.
      val wavePosts = expanded.filter(_.post.isDefined).map(_.post.get).toDF()
      // The discovered-link frontier is staged to parquet like every other
      // wave product, NOT held in the in-memory columnar cache: at 1M-scale
      // the "small" link set is 3.7M rows, and the next wave's scheduling
      // scan then pays the cache's row-at-a-time deserialization on the hot
      // path (measured: the biggest single CPU consumer of the 8-core
      // bench). Columnar files read back splittable and prunable; =0
      // reverts to the cache for A/B.
      // the link rows persist COORDINATES only — the URL string (~70 B of
      // the ~100 B row) is grammar-derived, so dropping it shrinks the
      // inter-wave frontier file (written AND re-read every wave) by ~2/3;
      // the next wave's `keyed` re-materializes it (UrlGrammar)
      val linksDf = expanded.filter(_.link.isDefined).map(_.link.get).toDF()
        .drop("url")
      val nextFrontier =
        if (sys.env.get("SPARK_GRAFT_LINKS_STAGE").contains("0"))
          linksDf.persist(StorageLevel.MEMORY_AND_DISK)
        else {
          val p = s"$workDir/waves/w$wave/links"
          tick("links.write", wave)(linksDf.write.mode("overwrite").parquet(p))
          // empty-frontier writes may leave no part files — pin the schema
          spark.read.schema(linksDf.schema).parquet(p)
        }

      // 7. state updates + lineage: the parquet footer makes the fresh
      // count near-free; the frontier count drives the full expand (the
      // fetch happens HERE) while caching only the (small) links
      // count what was actually OFFERED to scheduling: failed-site rows
      // pruned by frontierLive were never duplicate URLs and must not be
      // absorbed into the 'deduped' lineage metric (the extra count runs
      // only on the rare failure path)
      val scheduledCount =
        if (midCrawlFailures.isEmpty) frontierCount
        else tick("live.count", wave)(frontierLive.count())
      val freshCount = tick("staged.count", wave)(fetchInput.count())
      frontierCount = tick("expand+links.count", wave)(nextFrontier.count())
      // per-wave constants ride a broadcast 1-row frame, not literals:
      // same Janino-churn argument as the stage-out write — values in
      // relation data keep the lineage projection's generated source
      // wave-invariant (types unchanged: int, long, long)
      val waveMeta = Seq((wave, scheduledCount, scheduledCount - freshCount))
        .toDF("wave", "scheduled", "deduped")
      val waveLineage = waveLineageBase
        .crossJoin(broadcast(waveMeta))
        .select("wave", "partition_id", "scheduled", "deduped", "fetched")

      // schedule part re-reads the staged parquet (no recompute)
      scheduleParts += fetchInput.select(
        "wave", "host", "url", "canonical", "url_hash", "site_id", "page", "row",
        "depth", "ready_ms", "crawl_delay_ms")
      // a site that exhausted mid-crawl retries keeps its URLs OUT of the
      // seen set: its fetches never happened, so a snapshot resume (or the
      // next daemon run) must re-schedule them — the schedule rows above
      // remain as the attempt record the error report cites
      val seenInput =
        if (midCrawlFailures.isEmpty) fetchInput
        else fetchInput.filter(!col("site_id").isin(midCrawlFailures.keys.toSeq: _*))
      seenParts += seenInput.select(col("url_hash"), col("wave").as("first_wave"))
      val seenDelta = if (midCrawlFailures.isEmpty) freshCount else seenInput.count()
      seenCount += seenDelta
      // the sketch exists to prefilter the NEXT wave's frontier — when the
      // crawl just drained (no discovered links), folding the final wave in
      // would be a full-scan aggregate + driver-side bitmap merge that no
      // probe ever reads (at the 1M-scale bench this is a ~3.7M-row Bloom
      // rebuild on the last wave, pure Amdahl overhead)
      if (frontierCount > 0)
        tick("sketch.add", wave)(sketch.add(seenInput, seenDelta, "url_hash")(seenAll))
      postParts += wavePosts
      lineageParts += waveLineage

      cfg.snapshotDir.foreach { dir =>
        // failed sites are filtered OUT of the persisted posts/seen state
        // (their earlier-wave contributions included — the 'failed plugin
        // yields an error, not partial output' contract must survive a
        // snapshot resume) and recorded in the manifest so a resumed run
        // still reports them
        Snapshots.write(spark, dir, wave, Map(
          "posts" -> excludeFailedSites(postParts.reduce(_ unionByName _)),
          "seen" -> excludeFailedSeen(seenAll, scheduleParts),
          "frontier" -> nextFrontier,
          "schedule" -> scheduleParts.reduce(_ unionByName _),
          "lineage" -> lineageParts.reduce(_ unionByName _)), cfg,
          failures = midCrawlFailures.toMap.view.mapValues(_.getMessage).toMap)
      }

      frontier = nextFrontier
      wave += 1
    }

    // a site that exhausted mid-crawl retries contributes NO posts to the
    // run (the reference's failed plugin yields an error, not partial
    // output — mod.rs:38-93); its schedule/lineage rows remain as the
    // attempt record the error report cites
    val livePosts = excludeFailedSites(postParts.reduce(_ unionByName _))
    Result(
      livePosts,
      excludeFailedSeen(seenAll, scheduleParts.toSeq),
      scheduleParts.reduce(_ unionByName _),
      lineageParts.reduce(_ unionByName _),
      ssoBootstraps,
      midCrawlFailures.toMap,
      fetchLogParts.reduce(_ unionByName _))
  }
}
