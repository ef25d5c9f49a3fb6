package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Change-rate-aware recrawl scheduling. The reference daemon recrawls
 * every site on one fixed cron cadence (daemon.yml:3-7 — schedule +
 * workflow_dispatch); at 10^7 sites a fixed cadence either hammers dead
 * boards or lags hot ones, so the generalization derives each site's
 * cadence from its own observed posting history: schedule the next crawl
 * so it expects ~`targetBatch` new posts, clamped to [min, max].
 *
 * All scheduling math is integer (minutes, floor division) — exact
 * under the driver's value-hash gate, no float drift.
 *
 * Scale shape: one groupBy(site) aggregation over the posts table —
 * map-side combined, a single exchange of site keys; the arithmetic is
 * per-group scalar work after the agg.
 */
object Recrawl {

  /**
   * Per-site crawl schedule from posting history.
   * Output: site (as `siteCol`), n_posts, span_minutes (first→last
   * observed post), interval_minutes = clamp(targetBatch * span /
   * max(n_posts - 1, 1), [minMinutes, maxMinutes]), next_due =
   * last post + interval.
   */
  def schedule(posts: DataFrame, siteCol: String, createdCol: String,
      targetBatch: Int, minMinutes: Long, maxMinutes: Long): DataFrame = {
    require(targetBatch > 0 && minMinutes >= 0 && maxMinutes >= minMinutes,
      s"bad schedule bounds: target=$targetBatch, [$minMinutes, $maxMinutes]")
    posts.groupBy(col(siteCol))
      .agg(count(lit(1)).as("n_posts"),
        min(unix_timestamp(col(createdCol))).as("_first_s"),
        max(unix_timestamp(col(createdCol))).as("_last_s"))
      .withColumn("span_minutes",
        floor((col("_last_s") - col("_first_s")) / 60L).cast("long"))
      .withColumn("interval_minutes",
        least(greatest(
            // floor division on non-negative values; the product stays far
            // below 2^53 (span fits 32 bits, targetBatch is an Int), so the
            // double-division floor is exact
            floor(lit(targetBatch.toLong) * col("span_minutes") /
              greatest(col("n_posts") - lit(1L), lit(1L))).cast("long"),
            lit(minMinutes)), lit(maxMinutes)))
      .withColumn("next_due",
        timestamp_seconds(col("_last_s") + col("interval_minutes") * 60L))
      .drop("_first_s", "_last_s")
  }
}
