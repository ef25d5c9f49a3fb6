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
