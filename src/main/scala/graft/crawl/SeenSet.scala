package graft.crawl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/**
 * The URL-seen set: the generalization of the reference's per-site post
 * cache keyed by id (SsufidCore cache, packages/ssufid/src/core/
 * mod.rs:19-23,269-333 — a post is "seen" iff its id is in the cache) to
 * `xxhash64(url_canonicalize(url))` keys with a Bloom pre-filter.
 *
 * Two layers:
 *  - exact: a table of url_hash (stored partitioned by hash range — the
 *    MERGE side stays co-partitioned, no extra shuffle at update);
 *  - approximate: a Bloom sketch over the exact table, broadcast to the
 *    frontier. Membership test is a codegen'd expression
 *    (BloomFilterMightContain), NOT a join.
 *
 * Dedup protocol per wave (false-positive-safe):
 *  - bloom says NO  -> definitely new, no join needed (the common case:
 *    at 10^10 URLs the bloom absorbs the probe side);
 *  - bloom says MAYBE -> exact left-anti join on the (small) maybe slice.
 */
object SeenSet {

  /** Build (and serialize) a Bloom sketch of the seen hashes. */
  def buildBloom(seen: DataFrame, hashCol: String, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val bf: BloomFilter = seen.stat.bloomFilter(hashCol, math.max(expectedItems, 1L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Codegen'd membership probe against a serialized Bloom sketch. */
  def mightContain(bloom: Array[Byte], hash: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        ColumnBridge.expression(lit(bloom)),
        ColumnBridge.expression(hash)))
  }

  /** Build a serialized cuckoo filter of the seen hashes (the deletable
    * alternative sketch — custom TypedImperativeAggregate). */
  def buildCuckoo(seen: DataFrame, hashCol: String, expectedItems: Long): Array[Byte] =
    seen.agg(graft.functions.CuckooFunctions
      .cuckoo_filter_agg(col(hashCol), math.max(expectedItems, 16L)).as("f"))
      .collect()(0).getAs[Array[Byte]]("f")

  /**
   * New-URL filter: rows of `wave` whose `hashCol` is NOT in `seen`.
   * Sketch-negative rows skip the join entirely; sketch-positive rows are
   * verified with an exact left-anti join. `sketch` selects the
   * approximate layer: "bloom" (built-in sketch) or "cuckoo" (custom
   * aggregate, supports deletion for URL retirement).
   */
  def filterNew(wave: DataFrame, seen: DataFrame, hashCol: String,
      seenCount: Long, sketch: String = "bloom"): DataFrame = {
    if (seenCount == 0L) return wave
    val probe: Column = sketch match {
      case "cuckoo" =>
        val f = buildCuckoo(seen, hashCol, seenCount)
        graft.functions.CuckooFunctions.cuckoo_might_contain(lit(f), col(hashCol))
      case _ =>
        mightContain(buildBloom(seen, hashCol, seenCount), col(hashCol))
    }
    val maybe = wave.filter(probe)
      .join(seen.select(hashCol), Seq(hashCol), "left_anti")
    wave.filter(!probe).unionByName(maybe)
  }
}
