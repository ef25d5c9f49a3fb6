package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * The composed end-to-end curation recipe: corpus in, training-ready
 * packed batches out. Chains the engine's own stages in the order a real
 * pretraining pipeline runs them:
 *
 *   1. quality gate     — [[TextAnalysis.qualityFilter]] (cheap envelope)
 *   2. exact dedup      — [[Dedup.exactDedup]] (digest winners)
 *   3. decontamination  — [[Dedup.containmentPairs]] vs a benchmark probe
 *                         set; hit documents AND the probe members leave
 *   4. sequence packing — [[Packing.packSequences]] into fixed-capacity
 *                         token bins per source
 *
 * Every stage is individually oracle-checked (q54/q24/q60/q70); the
 * composition is checked end-to-end as ONE chained SQL replay (q92), so
 * stage-boundary semantics (e.g. the df-cut population being the DEDUPED
 * corpus, not the raw one) are pinned, not assumed.
 *
 * Scale: the stages keep their individual shapes — the corpus crosses one
 * digest-keyed exchange (dedup), one map-side broadcast probe join
 * (decontamination), and one group-keyed exchange (packing); quality and
 * token counting fuse into the scans on either side. Nothing here adds a
 * driver loop or a corpus-squared join.
 */
object Recipe {

  def trainReady(
      docs: DataFrame, probes: DataFrame, idCol: String, textCol: String,
      groupCol: String, n: Int = 3, containment: Double = 0.5,
      maxShingleFreq: Long = 20L, capacity: Long = 128L): Dataset[PackedDoc] = {
    val quality = TextAnalysis.qualityFilter(docs, textCol)
    val deduped = Dedup.exactDedup(quality, idCol, textCol)
    // decontaminate: the df-cut population is the deduped corpus — hot
    // shingles of the SURVIVORS, which is what the probe join sees
    val hits = Dedup.containmentPairs(
        deduped, idCol, textCol, probes, idCol, textCol,
        n, containment, maxShingleFreq)
      .select(col("corpus_id").as(idCol)).distinct()
    val clean = deduped
      .join(hits, Seq(idCol), "left_anti")
      .join(probes.select(col(idCol)), Seq(idCol), "left_anti")
    Packing.packSequences(clean, idCol, groupCol,
      TextAnalysis.tokenCount(col(textCol)), capacity)
  }
}
