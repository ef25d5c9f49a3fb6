package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic corpus sampling — the "take a reproducible slice of 100 TB"
 * primitives. Random sampling (`df.sample`) is seed-AND-partitioning
 * dependent, so a re-run after a repartition yields a different corpus;
 * these operators key every decision off a content hash instead, so the
 * same rows are selected no matter how the data is laid out, how many
 * executors run, or which engine re-executes the predicate.
 */
object Sampling {

  /**
   * Hash-gate sample: keep rows whose lowercase-hex `md5(key)` is strictly
   * below `hexThreshold` (e.g. "29" ≈ 16%, "0a" ≈ 2.4%). A pure
   * filter — codegen'd, pushdown-friendly, zero shuffles — and portable:
   * md5 hex is identical in every engine, so an oracle can re-derive the
   * exact membership.
   */
  def hashSample(df: DataFrame, keyCol: String, hexThreshold: String): DataFrame = {
    require(hexThreshold.nonEmpty &&
      hexThreshold.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')),
      s"threshold must be lowercase hex, got '$hexThreshold'")
    df.filter(substring(md5(col(keyCol).cast("string")), 1, hexThreshold.length) < hexThreshold)
  }

  /**
   * Stratified deterministic sample: the first `n` rows of each stratum in
   * (md5(key), tie) order — a fixed-size per-stratum quota (per-language /
   * per-source caps in a training mix). The hash ordering makes the pick
   * content-uniform within the stratum yet fully reproducible.
   *
   * Scale: one exchange on the stratum key; each stratum sorts (spillable)
   * and streams the rank filter. Strata in a corpus mix (language ×
   * source) number in the thousands, far above executor count, so the
   * window parallelizes; a single monster stratum degrades to one sorted
   * spill, never a quadratic probe. Output keeps every input column plus
   * the 1-based `sample_rank`.
   */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      n: Int, tieCol: String): DataFrame = {
    require(n >= 1, s"sample size must be >= 1, got $n")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(keyCol).cast("string")), col(tieCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= n)
  }

  /**
   * Temperature-scaled source mixture: draw a `total`-row corpus whose
   * per-stratum quotas follow weights n_s^(1/2) — the flattened sampling
   * distribution multilingual/multi-source LM recipes use to keep small
   * strata represented (alpha-sampling at alpha = 0.5). Everything is
   * INTEGER arithmetic so any engine re-derives identical quotas:
   * weight = floor(sqrt(n)) (exact in doubles to 2^52), base quota =
   * total*w div W, and the remainder seats go to the largest
   * (total*w mod W) with the stratum name breaking ties. Row selection
   * within a stratum is the md5-order rank (layout-independent).
   *
   * Scale: the quota frame is #strata rows (one tiny count aggregate +
   * single-partition window), broadcast back; the corpus itself crosses
   * ONE stratum-keyed exchange for the rank window. A stratum whose quota
   * exceeds its rows simply yields all of them (the mixture then
   * undershoots `total` — upweight with [[balanceUpsample]] instead).
   */
  def temperatureMixture(df: DataFrame, strataCol: String, keyCol: String,
      total: Long, tieCol: String): DataFrame = {
    require(total >= 1, s"total must be >= 1, got $total")
    val wAll = Window.partitionBy(lit(1))
    val quotas = df.groupBy(col(strataCol)).agg(count(lit(1)).as("_n"))
      .withColumn("_wt", floor(sqrt(col("_n"))).cast("long"))
      .withColumn("_W", sum(col("_wt")).over(wAll))
      .withColumn("_base", expr(s"($total * _wt) div _W"))
      .withColumn("_rem", expr(s"($total * _wt) % _W"))
      .withColumn("_deficit", lit(total) - sum(col("_base")).over(wAll))
      .withColumn("_rr", row_number().over(
        Window.partitionBy(lit(1)).orderBy(col("_rem").desc, col(strataCol))))
      .withColumn("_quota",
        col("_base") + when(col("_rr") <= col("_deficit"), 1L).otherwise(0L))
      .select(col(strataCol), col("_quota"))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(keyCol).cast("string")), col(tieCol))
    df.join(broadcast(quotas), Seq(strataCol))
      .withColumn("mix_rank", row_number().over(w).cast("long"))
      .filter(col("mix_rank") <= col("_quota"))
      .drop("_quota")
  }

  /**
   * Inverse-frequency rebalancing: upsample each stratum toward the
   * largest stratum's size by repeating its rows over `epoch` copies —
   * the "rare-language parity" recipe, with the repeat factor capped at
   * `capPct`% (3 epochs by default; unbounded repetition of a tiny
   * stratum degrades quality faster than it fixes balance). Fractional
   * epochs are realized exactly: pct = min(cap, 100*maxN div n) per
   * stratum, every row repeats pct div 100 times, and the first
   * (n * (pct mod 100)) div 100 rows in md5 order get one extra copy.
   * All integer arithmetic — an oracle re-derives the exact multiset.
   *
   * Scale: spec frame is #strata rows broadcast back; one stratum-keyed
   * exchange for the rank window; the explode multiplies rows map-side
   * (never more than capPct/100 ×).
   */
  def balanceUpsample(df: DataFrame, strataCol: String, keyCol: String,
      tieCol: String, capPct: Long = 300L): DataFrame = {
    require(capPct >= 100, s"capPct must be >= 100, got $capPct")
    val wAll = Window.partitionBy(lit(1))
    val spec = df.groupBy(col(strataCol)).agg(count(lit(1)).as("_n"))
      .withColumn("_maxN", max(col("_n")).over(wAll))
      .withColumn("_pct", least(lit(capPct), expr("(100 * _maxN) div _n")))
      .withColumn("_full", expr("_pct div 100"))
      .withColumn("_extraQ", expr("(_n * (_pct % 100)) div 100"))
      .select(col(strataCol), col("_full"), col("_extraQ"))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(keyCol).cast("string")), col(tieCol))
    df.join(broadcast(spec), Seq(strataCol))
      .withColumn("_rnk", row_number().over(w))
      .withColumn("_e",
        col("_full") + when(col("_rnk") <= col("_extraQ"), 1L).otherwise(0L))
      .withColumn("epoch", explode(sequence(lit(0L), col("_e") - 1)))
      .drop("_full", "_extraQ", "_rnk", "_e")
  }
}
