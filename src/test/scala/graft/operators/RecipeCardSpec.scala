package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** End-to-end recipe composition and dataset-card statistics. */
class RecipeCardSpec extends SparkSuite {
  import spark.implicits._

  // 25 stopword-bearing tokens: passes every quality gate
  private val good =
    "the quick brown fox jumps over a lazy dog and then runs back to " +
    "the barn for a nap in the warm hay pile today"

  test("trainReady: each stage removes exactly its targets, survivors pack") {
    val docs = Seq(
      (1L, "src", good),                        // survives everything
      (2L, "src", good + " extra tail words"),  // survives (distinct text)
      (3L, "src", good),                        // exact dup of 1 -> dropped
      (4L, "src", "short"),                     // fails quality (< 20 tokens)
      (17L, "src", good + " benchmark suffix marker tokens") // probe member
    ).toDF("doc_id", "source", "text")
    val probes = docs.filter(col("doc_id") % 17 === 0)
    val out = Recipe.trainReady(docs, probes, "doc_id", "text", "source",
      n = 3, containment = 0.5, maxShingleFreq = 0L, capacity = 128L)
      .collect().map(p => p.doc_id -> p).toMap
    assert(!out.contains(3L), "exact duplicate leaves")
    assert(!out.contains(4L), "low-quality doc leaves")
    assert(!out.contains(17L), "probe member is not training data")
    // docs 1 and 2 share >= 50% of the probe's shingles (the probe is
    // good+suffix, so most of its shingles are inside good): they are
    // contamination hits IF containment >= .5; compute what the operator
    // decided and assert consistency with containmentPairs directly
    val hits = Dedup.containmentPairs(
      Dedup.exactDedup(TextAnalysis.qualityFilter(docs, "text"), "doc_id", "text"),
      "doc_id", "text", probes, "doc_id", "text", 3, 0.5, 0L)
      .select("corpus_id").as[Long].collect().toSet
    assert(out.keySet.intersect(hits).isEmpty,
      "no contamination hit survives into the packed output")
    // survivors are packed with contiguous next-fit numbering
    val survivors = out.values.toSeq.sortBy(p => (p.bin_id, p.bin_pos))
    survivors.headOption.foreach { first =>
      assert(first.bin_id === 0L && first.bin_pos === 0)
    }
    assert(survivors.forall(_.n_tokens > 0))
  }

  test("trainReady: empty probe set degrades to quality+dedup+pack") {
    val docs = Seq(
      (1L, "a", good),
      (2L, "a", good) // dup
    ).toDF("doc_id", "source", "text")
    val probes = docs.filter(lit(false))
    val out = Recipe.trainReady(docs, probes, "doc_id", "text", "source")
      .collect()
    assert(out.map(_.doc_id).toSet === Set(1L))
  }

  test("datasetCard: hand-computed slice statistics") {
    val docs = Seq(
      (1L, "s1", "en", good),
      (2L, "s1", "en", good),            // dup text
      (3L, "s1", "en", "tiny doc"),      // fails quality
      (4L, "s2", "ko", good + " more")
    ).toDF("doc_id", "source", "lang", "text")
    val card = Profile.datasetCard(docs, Seq("source", "lang"), "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val s1 = card(("s1", "en"))
    assert(s1.getAs[Long]("n_docs") === 3L)
    assert(s1.getAs[Long]("n_distinct_texts") === 2L)
    assert(s1.getAs[Long]("n_quality_pass") === 2L)
    assert(math.abs(s1.getAs[Double]("dup_ratio") - 1.0 / 3) < 1e-6)
    val s2 = card(("s2", "ko"))
    assert(s2.getAs[Long]("n_docs") === 1L)
    assert(s2.getAs[Double]("dup_ratio") === 0.0)
    // token volume = exact whitespace token sum
    val expectedTokens = good.split("\\s+").length.toLong
    assert(s2.getAs[Long]("n_tokens") === expectedTokens + 1L)
  }
}
