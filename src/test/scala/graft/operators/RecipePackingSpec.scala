package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Data-recipe layer: temperature mixture, inverse-frequency rebalancing,
  * sequence packing, interleaved token streams. */
class RecipePackingSpec extends SparkSuite {
  import spark.implicits._

  test("temperatureMixture: integer sqrt weights, largest-remainder seats, hand-checked quotas") {
    // strata counts 9 / 4 / 1 -> weights 3 / 2 / 1, W = 6, total = 7:
    // bases 3 / 2 / 1 (sum 6), remainders 3 / 2 / 1 -> the single deficit
    // seat goes to stratum a. Quotas: a=4, b=2, c=1.
    val docs = ((1 to 9).map(i => (i.toLong, "a")) ++
      (10 to 13).map(i => (i.toLong, "b")) ++ Seq((14L, "c")))
      .toDF("doc_id", "lang")
    val out = Sampling.temperatureMixture(docs, "lang", "doc_id", 7L, "doc_id")
    val quotas = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(quotas === Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
  }

  test("temperatureMixture: quota past a stratum's size yields all its rows (documented undershoot)") {
    val docs = ((1 to 16).map(i => (i.toLong, "big")) ++ Seq((99L, "tiny")))
      .toDF("doc_id", "lang")
    // weights 4 / 1, W = 5, total = 10 -> bases 8 / 2; tiny has only 1 row
    val out = Sampling.temperatureMixture(docs, "lang", "doc_id", 10L, "doc_id")
    val quotas = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(quotas("tiny") === 1L)
    assert(out.count() === quotas("big") + 1)
  }

  test("temperatureMixture is layout-invariant: identical membership after a repartition") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def pick(df: org.apache.spark.sql.DataFrame) =
      Sampling.temperatureMixture(df, "lang", "doc_id", 50L, "doc_id")
        .select("doc_id").as[Long].collect().toSet
    assert(pick(docs) === pick(docs.repartition(17)))
  }

  test("balanceUpsample: exact epoch multiset with fractional epochs") {
    // counts: a=5 (the max), b=2. b's pct = min(300, 100*5 div 2) = 250 ->
    // every b row 2 epochs, extraQ = 2*50 div 100 = 1 -> the md5-first b
    // row gets a 3rd epoch. a rows get exactly 1 epoch each.
    val docs = ((1 to 5).map(i => (i.toLong, "a")) ++ Seq((6L, "b"), (7L, "b")))
      .toDF("doc_id", "lang")
    val out = Sampling.balanceUpsample(docs, "lang", "doc_id", "doc_id")
    val byDoc = out.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    (1 to 5).foreach(i => assert(byDoc(i.toLong) === 1L))
    assert(Set(byDoc(6L), byDoc(7L)) === Set(2L, 3L))
    // epoch indices are dense from 0
    val eps = out.filter(col("doc_id") >= 6).groupBy("doc_id")
      .agg(array_sort(collect_list("epoch")).as("e"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(eps.values.toSet === Set(Seq(0L, 1L), Seq(0L, 1L, 2L)))
  }

  test("packSequences: next-fit hand-check, oversized doc sits alone, groups independent") {
    val docs = Seq(
      (1L, "g1", 5L), (2L, "g1", 3L), (3L, "g1", 4L), (4L, "g1", 2L), (5L, "g1", 6L),
      (6L, "g2", 12L), (7L, "g2", 1L)
    ).toDF("doc_id", "source", "t")
    val out = Packing.packSequences(docs, "doc_id", "source", col("t"), capacity = 8L)
      .collect().map(p => p.doc_id -> ((p.bin_id, p.bin_pos))).toMap
    assert(out(1L) === ((0L, 0))); assert(out(2L) === ((0L, 1))) // 5+3=8 fits
    assert(out(3L) === ((1L, 0))); assert(out(4L) === ((1L, 1))) // 4+2=6 fits
    assert(out(5L) === ((2L, 0)))
    assert(out(6L) === ((0L, 0))) // oversized: alone in its own bin
    assert(out(7L) === ((1L, 0))) // 12+1 > 8 -> next bin
  }

  test("packSequences: a NULL group's first document still opens bin 0 slot 0") {
    val docs = Seq(
      (1L, Option.empty[String], 5L), (2L, Option.empty[String], 3L),
      (3L, Option("g"), 4L)
    ).toDF("doc_id", "source", "t")
    val out = Packing.packSequences(docs, "doc_id", "source", col("t"), capacity = 8L)
      .collect().map(p => p.doc_id -> ((p.bin_id, p.bin_pos))).toMap
    // regression: curGroup starts null, so a null group's first row used
    // to skip the group-init branch (null != null is false) and inherit
    // stale fill/pos state
    assert(out(1L) === ((0L, 0)))
    assert(out(2L) === ((0L, 1)))
    assert(out(3L) === ((0L, 0)))
  }

  test("packSequences bins respect capacity except oversized singletons; stats report waste") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val packed = Packing.packSequences(docs, "doc_id", "source",
      TextAnalysis.tokenCount(col("text")), capacity = 128L)
    val stats = Packing.packingStats(packed, 128L)
    val bad = stats.filter(col("fill") > 128 && col("n_docs") > 1).count()
    assert(bad === 0, "a multi-doc bin must never exceed capacity")
    assert(stats.agg(min("waste")).as[Long].head() >= 0L)
    // every doc lands exactly once
    assert(packed.count() === docs.count())
  }

  test("interleavedTokenStream renders payloads in offset order with costed media placeholders") {
    val spans = Seq(
      (1L, "text", "alpha beta", null, 0),
      (1L, "image", null, "media://x/1", 1),
      (1L, "text", "gamma", null, 2),
      (2L, "image", null, "media://x/2", 0)
    ).map { case (d, k, t, m, o) =>
      (d, k, Option(t).map(_.toString).orNull, Option(m).map(_.toString).orNull, o)
    }.toDF("doc_id", "kind", "text", "media_ref", "offset")
    val out = Spans.interleavedTokenStream(spans, mediaTokens = 10)
      .orderBy("doc_id")
      .select("stream", "n_text_tokens", "n_media", "n_tokens")
      .as[(String, Long, Long, Long)].collect()
    assert(out(0) === (("alpha beta <|media|> gamma", 3L, 1L, 13L)))
    assert(out(1) === (("<|media|>", 0L, 1L, 10L)))
  }
}
