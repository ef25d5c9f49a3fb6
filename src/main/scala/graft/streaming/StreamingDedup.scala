package graft.streaming

import org.apache.spark.sql.DataFrame

/**
 * Streaming exact deduplication — the ingest-time guard of a continuously
 * fed corpus (the streaming analog of `Dedup.exactDedup`, reference analog:
 * the crawler's URL-seen semantics applied to document ingest).
 *
 * Built on `dropDuplicatesWithinWatermark`: the first occurrence of each
 * key is emitted in the micro-batch it arrives in (no aggregation latency);
 * duplicates arriving while the key's state is live are dropped. The
 * event-time watermark bounds the state store — that is the property that
 * makes exact streaming dedup viable at all at 10^10-row scale: state is
 * O(keys within the watermark horizon), not O(all keys ever), and Spark
 * shards it by key hash across executors. Duplicates separated by MORE than
 * `delay` of event time may re-emit (the contract's "within watermark") —
 * choose `delay` to cover the real-world duplicate window (a re-crawl
 * period, a retry horizon), not the corpus lifetime.
 */
object StreamingDedup {

  /**
   * Deduplicate a streaming DataFrame on `keyCols`, keeping each key's
   * first arrival, with dedup state bounded by the `delay` event-time
   * watermark on `tsCol`.
   */
  def dedupStream(df: DataFrame, keyCols: Seq[String], tsCol: String,
      delay: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one dedup key column required")
    df.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)
  }
}
