package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One packed document: `bin_id` is the 0-based bin ordinal WITHIN its
  * group, `bin_pos` the 0-based slot inside the bin. Top-level case class —
  * nested/private case classes break encoder codegen. */
final case class PackedDoc(doc_id: Long, group: String, n_tokens: Long,
    bin_id: Long, bin_pos: Int)

/**
 * Sequence packing — fill fixed-capacity token bins ("context windows")
 * with whole documents, the step between a cleaned corpus and a training
 * batch. Semantics are NEXT-FIT greedy per group in ascending doc order:
 * a document that fits the open bin joins it, otherwise it opens a new
 * bin (an oversized document therefore sits alone). Next-fit, not
 * best-fit, deliberately: it is single-pass streaming, deterministic,
 * and an oracle can replay it row by row — best-fit packs ~5% denser but
 * needs a bin index that no longer streams.
 *
 * Scale: packing is a per-key sequential scan with carried state — the
 * one shape Catalyst cannot express declaratively — so this is the
 * documented `mapPartitions` case: ONE exchange partitions by group,
 * a partition-local sort orders (group, doc) with spill support, and the
 * packer streams each partition with O(1) state. No group is ever
 * collected; a 10^6-document group costs its sort, nothing more.
 */
object Packing {

  def packSequences(df: DataFrame, idCol: String, groupCol: String,
      tokens: Column, capacity: Long): Dataset[PackedDoc] = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
        col(groupCol).as("group"), tokens.cast("long").as("n_tokens"))
      .repartition(col("group"))
      .sortWithinPartitions(col("group"), col("doc_id"))
      .as[(Long, String, Long)]
      .mapPartitions { it =>
        // groups never straddle partitions (hash-partitioned above), so
        // per-partition carried state is exact; `started` (not a null
        // sentinel in curGroup) so a NULL group's first row still takes
        // the group-init branch
        var started = false
        var curGroup: String = null
        var fill = 0L
        var bin = 0L
        var pos = 0
        it.map { case (id, g, t) =>
          if (!started || g != curGroup) {
            started = true; curGroup = g; bin = 0L; pos = 0; fill = t
          }
          else if (fill + t <= capacity) { pos += 1; fill += t }
          else { bin += 1L; pos = 0; fill = t }
          PackedDoc(id, g, t, bin, pos)
        }
      }
  }

  /** Bin-level rollup of [[packSequences]]: docs per bin, fill, waste —
    * the packing-efficiency report a recipe pipeline monitors. */
  def packingStats(packed: Dataset[PackedDoc], capacity: Long): DataFrame =
    packed.groupBy("group", "bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("fill"))
      .withColumn("waste", greatest(lit(capacity) - col("fill"), lit(0L)))
}
