package graft.operators

import graft.SparkSuite

/** Inverted index + PMI collocations vs hand-computed references. */
class IndexPmiSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "new york is big"),
    (2L, "new york new york"),
    (3L, "york is old"),
    (4L, "big and old")
  ).toDF("doc_id", "text")

  test("invertedIndex: df counts once per doc, postings sorted, min/max df cuts") {
    val idx = TextAnalysis.invertedIndex(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getSeq[Long](2)))).toMap
    assert(idx("york") === ((3L, Seq(1L, 2L, 3L))))  // doc 2 counted ONCE
    assert(idx("new") === ((2L, Seq(1L, 2L))))
    assert(idx("and") === ((1L, Seq(4L))))
    // df cuts
    val cut = TextAnalysis.invertedIndex(docs, "doc_id", "text", minDf = 2L, maxDf = 2L)
      .collect().map(_.getString(0)).toSet
    assert(cut === Set("new", "is", "big", "old")) // york (3) and singletons drop
  }

  test("pmiCollocations matches the hand formula; totals are pre-filter") {
    // tokens: 4+4+3+3 = 14 unigrams; bigrams: 3+3+2+2 = 10
    // "new york": cxy=3 (doc2 has it twice), cx(new)=3, cy(york)=4
    val out = TextAnalysis.pmiCollocations(docs, "text", minCount = 2L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.contains("new york"))
    val (cxy, pmi) = out("new york")
    assert(cxy === 3L)
    val expected = BigDecimal(
        math.log(3.0 * 14.0 * 14.0 / (10.0 * 3.0 * 4.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(pmi === expected)
    // minCount filters pairs but NOT the totals: "york is" (cxy=2) present
    assert(out.contains("york is") && !out.contains("is big"))
  }
}
