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
    df.filter(substring(md5(col(keyCol)), 1, hexThreshold.length) < hexThreshold)
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
      .orderBy(md5(col(keyCol)), col(tieCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= n)
  }
}
