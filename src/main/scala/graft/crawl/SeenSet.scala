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

  /**
   * New-URL filter: rows of `wave` whose `hashCol` is NOT in `seen`.
   * Bloom-negative rows skip the join entirely; bloom-positive rows are
   * verified with an exact left-anti join.
   */
  def filterNew(wave: DataFrame, seen: DataFrame, hashCol: String,
      seenCount: Long): DataFrame = {
    if (seenCount == 0L) return wave
    val bloom = buildBloom(seen, hashCol, seenCount)
    val maybe = wave.filter(mightContain(bloom, col(hashCol)))
      .join(seen.select(hashCol), Seq(hashCol), "left_anti")
    wave.filter(!mightContain(bloom, col(hashCol))).unionByName(maybe)
  }
}
