package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Site-level boilerplate removal — the nav/header/footer cleaning step of
 * a web-corpus pipeline (the CCNet/jusText family of line-frequency
 * filters): a line that appears in at least `dfNum/dfDen` of a site's
 * documents is template chrome, not content, and is stripped from every
 * document of that site.
 *
 * Scale shape (100 TB corpus, ~10^7 sites):
 *  - line strings NEVER shuffle: the document-frequency aggregation runs
 *    on (group, xxhash64(line)) — one exchange of 16-byte keys with
 *    map-side partial distinct-aggregation;
 *  - the boilerplate set is naturally tiny (lines above a df threshold
 *    are bounded by lines-per-doc / threshold per group), so it rides
 *    back as a BROADCAST per-group hash array and the strip itself is a
 *    map-side higher-order filter — the corpus is never re-shuffled;
 *  - per-line membership is an O(|bl_group|) array scan; at hundreds of
 *    boilerplate lines per site this stays cheap, and a sorted-array
 *    binary-search kernel is the drop-in upgrade if a pathological site
 *    ever grows past that.
 */
object Boilerplate {

  /** Trimmed, non-empty lines of a text column. */
  def textLines(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => length(l) > 0)

  /**
   * Boilerplate line keys: (group, line_hash, n_docs, group_docs) for
   * every line whose within-group document frequency satisfies
   * `n_docs * dfDen >= group_docs * dfNum` (an exact rational threshold —
   * no float compare). Line strings are hashed before the exchange.
   */
  def boilerplateKeys(df: DataFrame, groupCol: String, idCol: String,
      textCol: String, dfNum: Int, dfDen: Int): DataFrame = {
    require(dfNum > 0 && dfDen > 0, s"threshold must be positive: $dfNum/$dfDen")
    val sizes = df.groupBy(groupCol)
      .agg(countDistinct(col(idCol)).as("group_docs"))
    df.select(col(groupCol), col(idCol),
        explode(textLines(col(textCol))).as("_line"))
      .select(col(groupCol), col(idCol), xxhash64(col("_line")).as("line_hash"))
      .groupBy(groupCol, "line_hash")
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .join(broadcast(sizes), Seq(groupCol))
      .filter(col("n_docs") * dfDen >= col("group_docs") * dfNum)
  }

  /**
   * Strip boilerplate lines. Returns the input rows with `textCol`
   * replaced by the cleaned text (kept lines re-joined with "\n", order
   * preserved) plus `n_lines` / `n_removed` accounting columns. The
   * boilerplate set joins in as a broadcast per-group array; no
   * doc-keyed shuffle.
   */
  def strip(df: DataFrame, groupCol: String, idCol: String,
      textCol: String, dfNum: Int, dfDen: Int): DataFrame = {
    val perGroup = boilerplateKeys(df, groupCol, idCol, textCol, dfNum, dfDen)
      .groupBy(groupCol).agg(collect_list(col("line_hash")).as("_bl"))
    df.join(broadcast(perGroup), Seq(groupCol), "left")
      .withColumn("_lines", textLines(col(textCol)))
      .withColumn("_kept", filter(col("_lines"),
        l => !coalesce(array_contains(col("_bl"), xxhash64(l)), lit(false))))
      .withColumn("n_lines", size(col("_lines")).cast("long"))
      .withColumn("n_removed", (size(col("_lines")) - size(col("_kept"))).cast("long"))
      .withColumn(textCol, array_join(col("_kept"), "\n"))
      .drop("_bl", "_lines", "_kept")
  }
}
