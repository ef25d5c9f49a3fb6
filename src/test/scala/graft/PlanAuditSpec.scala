package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

/**
 * Plan audits: the optimizations the 100 TB design depends on must be
 * visible in the physical plan, not assumed — predicate pushdown to the
 * parquet scan, column pruning, broadcast of small dimensions, and
 * whole-stage codegen over the custom kernel expressions.
 */
class PlanAuditSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("range filter is pushed down to the parquet scan (q12)") {
    val plan = planOf("q12_range_filter")
    assert(plan.contains("PushedFilters"), plan.take(500))
    assert(plan.contains("GreaterThanOrEqual(ts") || plan.contains("ts#"),
      "ts predicate must reach the scan")
  }

  test("column pruning: q31 scans only (doc_id, text)") {
    val plan = planOf("q31_token_count")
    val readSchema = "ReadSchema: struct<doc_id:bigint,text:string>"
    assert(plan.contains(readSchema), plan.linesIterator.filter(_.contains("ReadSchema"))
      .mkString("\n"))
  }

  test("small dimensions broadcast in the enrichment join (q02)") {
    val plan = planOf("q02_join_enrich")
    assert(plan.contains("BroadcastHashJoin"), "nation/region must broadcast")
    assert(!plan.contains("SortMergeJoin") ||
      plan.split("BroadcastHashJoin").length > 2,
      "no shuffle join for 25/5-row dimensions")
  }

  test("custom kernels stay inside whole-stage codegen (q14)") {
    val df = SparkEntry.queries("q14_url_canonicalize")(spark, sf)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("static_invoke"), "kernel must appear as StaticInvoke")
    // the projection carrying the kernel has a codegen id (not fallback)
    assert("\\(\\d+\\) Project \\[codegen id".r.findFirstIn(formatted).isDefined, formatted)
  }

  test("near-dup pairs (q45): tile equi-join + codegen'd cosine kernel, no nested-loop join") {
    val df = SparkEntry.queries("q45_embedding_neardup")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") || plan.contains("_tile"),
      "the pair stage must be an equi-join keyed by tile, not an all-pairs BNLJ")
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("static_invoke") || formatted.contains("cosineSim"),
      "cosine must be the StaticInvoke kernel, not an interpreted HOF fold")
  }

  test("DSv2 source (q46): site pruning + limit + column pruning visible in the scan") {
    val df = spark.read.format("graft.sources.WebSource")
      .option("scale", "100").option("limit_per_site", "10").load()
      .filter(col("site_id") === "biz.ssu.ac.kr")
      .select("site_id", "title").limit(5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("sites=biz.ssu.ac.kr"), plan.take(600))
    assert(plan.contains("pushedLimit=5"), plan.take(600))
    assert(plan.contains("readColumns=site_id,title"), plan.take(600))
  }

  test("merge join keys: the MERGE shuffles on (site_id, id) exactly once per side (q04)") {
    val plan = planOf("q04_merge_upsert")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      "full-outer cache merge is a shuffle join")
    assert(plan.contains("FullOuter") || plan.contains("full_outer") ||
      plan.toLowerCase.contains("fullouter"))
  }
}
