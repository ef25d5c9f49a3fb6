package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Column-level data profiling — the "what did the crawl actually land"
 * audit a 100 TB ingest runs before anything downstream trusts the data:
 * per column, row/null counts, exact distinct cardinality, and min/max.
 *
 * One aggregation pass computes every column's stats together (a single
 * scan + one aggregate; Spark expands the multi-column distinct aggregate
 * via Expand — |cols| intermediate rows per input row, all map-side until
 * the one exchange). The wide 1-row result is then unpivoted driver-free
 * by exploding a struct array. Min/max are computed on the NATIVE type
 * and cast to
 * string only for presentation (casting first would compare
 * lexicographically — '9' > '10').
 */
object Profile {

  /**
   * Per-source "dataset card" statistics — the summary table a corpus
   * release ships (docs, token volume, exact-duplicate rate, quality-gate
   * pass rate per (source, lang) slice). One grouped aggregation pass:
   * token counts and the quality predicate fuse into the scan, the
   * duplicate rate reuses the exact-dedup digest (distinct md5 per
   * slice), and every ratio is a single fixed-order double rounded to
   * 6 dp so a SQL oracle replays it bit-for-bit.
   */
  def datasetCard(df: DataFrame, groupCols: Seq[String], textCol: String): DataFrame = {
    require(groupCols.nonEmpty, "datasetCard needs at least one group column")
    val toks = Dedup.tokens(col(textCol))
    val q = TextAnalysis.qualityFeatures(col(textCol))
    val pass = (q.getField("n_tokens").between(20, 100000) &&
      q.getField("punct_ratio") <= 0.3 &&
      q.getField("stopword_ratio") >= 0.02 &&
      q.getField("mean_word_len").between(2.0, 5.0)).cast("long")
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(toks).cast("long")).as("n_tokens"),
        count_distinct(md5(col(textCol))).as("n_distinct_texts"),
        sum(pass).as("n_quality_pass"))
      .withColumn("dup_ratio", round(
        (col("n_docs") - col("n_distinct_texts")).cast("double") /
          col("n_docs").cast("double"), 6))
      .withColumn("quality_pass_ratio", round(
        col("n_quality_pass").cast("double") / col("n_docs").cast("double"), 6))
  }

  /** Profile `cols` of `df`: (column, n_rows, n_nulls, n_distinct,
    * min_value, max_value) — one row per column, strings for min/max. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"_rows_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_nulls_$c"),
        count_distinct(col(c)).as(s"_nd_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"_rows_$c").as("n_rows"),
        col(s"_nulls_$c").as("n_nulls"),
        col(s"_nd_$c").as("n_distinct"),
        col(s"_min_$c").as("min_value"),
        col(s"_max_$c").as("max_value"))
    }
    wide.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }
}
