package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal joins a large-scale pipeline needs but vanilla Spark SQL plans
 * badly: as-of join and interval (range) join. A naive inequality join on
 * `l.key = r.key AND r.ts <= l.ts` is planned as a per-key nested loop (or
 * a BroadcastNestedLoopJoin when the equality is missing) — quadratic on
 * hot keys and hopeless at web scale. Both operators here re-express the
 * semantics as a single hash exchange plus streaming window/equi-join
 * work, the shapes that survive a 1000-executor cluster.
 *
 * Reference analog: ssufid merges freshly fetched rows onto the newest
 * cached row per post id (merge semantics in mod.rs); these operators are
 * the time-versioned generalizations of that "latest preceding version"
 * lookup.
 */
object TemporalJoins {

  /**
   * As-of join (kdb `aj` / DuckDB `ASOF LEFT JOIN`, `>=` direction): each
   * left row gains the payload of the LATEST right row with the same key
   * and `right.ts <= left.ts`, or nulls when no right row precedes it.
   *
   * Plan: NO join node at all. Both sides are tagged and UNIONed, then one
   * window over (key) ordered by (ts, side, tie) carries the most recent
   * right payload forward (`last(_, ignoreNulls)` over unbounded-preceding
   * rows). That is ONE hash exchange on the key — the theoretical minimum
   * for a keyed temporal merge — and a hot key costs a spillable sort
   * instead of a quadratic probe.
   *
   * Tie rules (any oracle must mirror them): a right row at exactly
   * `left.ts` matches (`>=`); among right duplicates at one (key, ts) the
   * greatest `tieCol` wins — the union window realizes this for free
   * because the running `last` sees right rows at equal ts in ascending
   * `tieCol` order.
   *
   * Output: every left column, then the requested right `payload` columns
   * renamed `r_<name>`.
   */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payload: Seq[String], tieCol: String): DataFrame = {
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    val leftCols = left.columns.toSeq
    val lTagged = left
      .withColumn("_k", col(keyCol)).withColumn("_t", col(tsCol))
      .withColumn("_side", lit(1))
    val rTagged = right.select(
      col(keyCol).as("_k"), col(tsCol).as("_t"), lit(0).as("_side"),
      col(tieCol).as("_tie"), struct(payload.map(col): _*).as("_r"))
    // allowMissingColumns fills the other side's columns with typed nulls
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_side"), col("_tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("_m").getField(p).as(s"r_$p")): _*)
  }

  /**
   * Interval (range) join: all pairs with `l.key = r.key` and
   * `r.ts ∈ [l.ts, l.ts + windowUs)` — "right events inside the window
   * opened by each left event".
   *
   * Plan: both sides are bucketed into window-width time bins and
   * equi-joined on (key, bin). A left interval of length `windowUs` spans
   * at most two bins, so the left side explodes to exactly 2 rows (bounded
   * fan-out, unlike shingle self-joins), the right side keeps one row, and
   * the exchange hashes on (key, bin) — which also shears a hot key across
   * time bins instead of concentrating it on one reducer. The exact range
   * predicate is re-checked after the equi-join, so the bucketing is a
   * pure candidate generator. Epochs must be non-negative (`div`
   * truncation = floor there).
   *
   * Output: every left column, then every right column renamed `r_<name>`.
   */
  def rangeJoinPairs(left: DataFrame, lKey: String, lTs: String,
      right: DataFrame, rKey: String, rTs: String,
      windowUs: Long): DataFrame = {
    require(windowUs > 0, s"window must be positive, got $windowUs")
    val leftCols = left.columns.toSeq
    val rightCols = right.columns.toSeq
    // parquet reads surface TIMESTAMP_NTZ; unix_micros needs TIMESTAMP —
    // the cast is wall-clock-stable under the engine's UTC session tz
    val lb = left
      .withColumn("_lus", unix_micros(col(lTs).cast("timestamp")))
      .withColumn("_bin", explode(array(
        expr(s"_lus div ${windowUs}L"), expr(s"_lus div ${windowUs}L") + 1)))
    val rb = right.select(
      (rightCols.map(c => col(c).as(s"r_$c")) :+
        unix_micros(col(rTs).cast("timestamp")).as("_rus")): _*)
      .withColumn("_bin", expr(s"_rus div ${windowUs}L"))
      .withColumn("_rk", col(s"r_$rKey"))
    lb.join(rb, lb("_bin") === rb("_bin") && col(lKey) === col("_rk"))
      .filter(col("_rus") >= col("_lus") &&
        col("_rus") < col("_lus") + windowUs)
      .select(leftCols.map(col) ++ rightCols.map(c => col(s"r_$c")): _*)
  }
}
