package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus release diff — the data-versioning layer's "what changed between
 * release v(N-1) and vN" report (the content-grain complement of
 * [[graft.crawl.Snapshots.changes]], which feeds key-level deltas to
 * incremental consumers). Every released corpus ships this table: which
 * documents were added, which were removed, which changed content, and
 * how many of each per slice.
 *
 * Scale: each side collapses to (key, md5-of-content) BEFORE the
 * full-outer join, so the exchange carries fixed-width digests — document
 * content never shuffles; the join is the standard two-sided hash
 * exchange on the key (broadcast when one release is small, e.g. a patch
 * release against deep history).
 */
object Versioning {

  /** Per-key diff: `(keyCols…, status)` with status ∈
    * added | removed | changed | unchanged. */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], contentCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "corpusDiff needs at least one key column")
    require(contentCols.nonEmpty, "corpusDiff needs at least one content column")
    def digested(df: DataFrame, as: String) = df.select(
      keyCols.map(col) :+
        md5(concat_ws("\u0001", contentCols.map(c =>
          coalesce(col(c).cast("string"), lit("\u0000"))): _*)).as(as): _*)
    digested(oldDf, "_od").join(digested(newDf, "_nd"), keyCols, "full_outer")
      .withColumn("status",
        when(col("_od").isNull, "added")
          .when(col("_nd").isNull, "removed")
          .when(col("_od") =!= col("_nd"), "changed")
          .otherwise("unchanged"))
      .select(keyCols.map(col) :+ col("status"): _*)
  }

  /** Release-note rollup of [[corpusDiff]]: row counts per status. */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], contentCols: Seq[String]): DataFrame =
    corpusDiff(oldDf, newDf, keyCols, contentCols)
      .groupBy("status").agg(count(lit(1)).as("n"))
}
