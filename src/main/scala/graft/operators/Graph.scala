package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Link-graph analytics over the crawl's URL/document graph. The reference
 * crawler only *walks* its link graph (board -> post fan-out); a 10^10-URL
 * frontier also wants to *rank* it — crawl prioritization by link
 * authority is the classic companion to politeness scheduling (see
 * SURVEY.md §2's frontier priority queue).
 *
 * PageRank is expressed as bounded Dataset iterations, not an RDD Pregel:
 *  - the edge table is hash-partitioned by `src` ONCE and localCheckpoint'd;
 *    every iteration's rank-to-edge join then shuffles only the rank table
 *    (|V| rows, two longs wide) while the edge blocks stay put — at 10^10
 *    edges the per-iteration traffic is O(|V|), not O(|E|),
 *  - contributions aggregate map-side per dst before the second exchange,
 *  - dangling mass (nodes with no out-links) is a one-row aggregate
 *    broadcast back into the update, keeping the rank sum at 1.0 exactly
 *    as the textbook formulation requires,
 *  - each iteration ends in a localCheckpoint so the loop never grows a
 *    lineage tree (same staging discipline as Dedup.nearDupClusters).
 */
object Graph {

  /**
   * Fixed-iteration damped PageRank. `nodes` must carry `idCol` (distinct);
   * `edges` carries (srcCol, dstCol) — self-loops and duplicate edges are
   * honored as given (callers dedup upstream if desired). Returns
   * (id, rank) with rank rounded to 6 dp for cross-engine comparability.
   */
  def pageRank(
      nodes: DataFrame, edges: DataFrame,
      idCol: String = "id", srcCol: String = "src", dstCol: String = "dst",
      iterations: Int = 5, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val ids = nodes.select(col(idCol).as("id")).distinct().localCheckpoint()
    val n = ids.count()
    require(n > 0, "pageRank needs a non-empty node set")
    // out-degree rides WITH the edge table so the per-iteration join needs
    // no second lookup; partitioned by src once, reused every round
    val deg = edges.groupBy(col(srcCol).as("src"))
      .agg(count(lit(1)).as("out_deg"))
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .join(deg, Seq("src"))
      .repartition(col("src"))
      .localCheckpoint()
    // the dangling-node ID SET is static: derive it once from the staged
    // lineage (not per iteration from the caller's raw edge plan — q73's
    // edge expression is a crossJoin + 3-way union that would otherwise
    // re-aggregate O(|E|) every round)
    val danglingIds = ids.join(deg.select(col("src").as("id")), Seq("id"),
      "left_anti").localCheckpoint()
    var ranks = ids.withColumn("rank", lit(1.0 / n)).localCheckpoint()
    var i = 0
    while (i < iterations) {
      val contribs = e.join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") / col("out_deg")).as("in_mass"))
      // dangling nodes donate their mass uniformly: 1-row agg, broadcast
      val dangling = ranks.join(danglingIds, Seq("id"), "left_semi")
        .agg(coalesce(sum("rank"), lit(0.0)).as("dangling_mass"))
      val next = ids
        .join(contribs, Seq("id"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("in_mass"), lit(0.0)) +
              col("dangling_mass") / n)).as("rank"))
      ranks = next.localCheckpoint()
      i += 1
    }
    ranks.select(col("id"), round(col("rank"), 6).as("rank"))
  }
}
