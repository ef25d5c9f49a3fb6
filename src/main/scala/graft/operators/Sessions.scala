package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization of an event stream — the standard
 * user-activity rollup a training-data/analytics pipeline runs over click
 * and interaction logs (reference analog: ssufid aggregates per-site crawl
 * events into per-run reports; this is the same shape generalized to
 * arbitrary user event streams).
 *
 * Scale: ONE shuffle, keyed by the user column. The lag window, the
 * cumulative session-id sum, and the per-session aggregation all cluster
 * on `userCol` (hash(user) co-locates every (user, session) group), so
 * Catalyst reuses the single Exchange across all three — the operator
 * costs one pass at any corpus size and skew is bounded by the busiest
 * single user, not the table.
 */
object Sessions {

  /**
   * Split each user's event stream into sessions separated by more than
   * `gapSec` of inactivity, then aggregate one row per session.
   *
   * Output: (user, session_id (1-based per user), n_events, start_us,
   * end_us, value_cents). Event values aggregate as integer cents — a
   * float sum's value depends on partial-aggregation order across
   * partitions, an integer sum does not (oracle-exact by construction).
   * Ties on the timestamp break deterministically on `tieCol`.
   */
  def sessionize(
      df: DataFrame, userCol: String = "user_id", tsCol: String = "ts",
      tieCol: String = "event_id", valueCol: String = "value",
      gapSec: Long = 1800L): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tsUs = unix_micros(col(tsCol).cast("timestamp"))
    val prevUs = lag(tsUs, 1).over(w)
    val isNew = when(prevUs.isNull || tsUs - prevUs > gapSec * 1000000L, 1L)
      .otherwise(0L)
    df.withColumn("_session_new", isNew)
      .withColumn("session_id", sum(col("_session_new")).over(cum))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(tsUs).as("start_us"),
        max(tsUs).as("end_us"),
        sum(round(col(valueCol) * 100).cast("long")).as("value_cents"))
  }
}
