package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SamplingTfidfSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "apple banana apple cherry", "en"),
    (1L, "banana banana durian", "en"),
    (2L, "apple cherry cherry cherry", "de"),
    (3L, "unique words only here", "de")
  ).toDF("doc_id", "text", "lang")

  test("tfidfTopTerms: exact integer scores, rare terms outrank common ones") {
    val out = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.sortBy(_._4)).toMap
    // doc 1: banana tf=2 df=2 -> 2*1e6/2 = 1e6; durian tf=1 df=1 -> 1e6.
    // Equal scores break ties alphabetically: banana first.
    assert(byDoc(1L).map(t => (t._2, t._3)) ===
      Seq(("banana", 1000000L), ("durian", 1000000L)))
    // doc 2: cherry tf=3 df=2 -> 3*1e6/2 = 1.5e6 beats apple tf=1 df=2 -> 5e5
    assert(byDoc(2L).head._2 === "cherry" && byDoc(2L).head._3 === 1500000L)
    // every doc emits exactly min(k, |vocab_doc|) rows with ranks 1..n
    assert(out.count(_._1 === 3L) === 2)
    assert(byDoc(3L).map(_._4) === Seq(1L, 2L))
  }

  test("tfidfTopTerms is stable under repartitioning (no layout dependence)") {
    val a = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", 3).collect().toSet
    val b = TextAnalysis.tfidfTopTerms(docs.repartition(7), "doc_id", "text", 3)
      .collect().toSet
    assert(a === b)
  }

  test("hashSample: deterministic membership, layout independent, roughly proportional") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val s1 = Sampling.hashSample(d, "text", "29").select("doc_id").collect().toSet
    val s2 = Sampling.hashSample(d.repartition(13), "text", "29")
      .select("doc_id").collect().toSet
    assert(s1 === s2 && s1.nonEmpty)
    // "29"/"100" of the hex space ~ 16%; allow wide tolerance on small n
    val frac = s1.size.toDouble / d.count()
    assert(frac > 0.05 && frac < 0.35, s"frac=$frac")
    intercept[IllegalArgumentException] { Sampling.hashSample(d, "text", "2G") }
  }

  test("stratifiedSample: exact per-stratum quota, reproducible order") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Sampling.stratifiedSample(d, "lang", "text", n = 10, tieCol = "doc_id")
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val avail = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (lang, n) => assert(n === math.min(10L, avail(lang))) }
    // ranks within each stratum are 1..n and the pick is layout-independent
    val again = Sampling.stratifiedSample(d.repartition(9), "lang", "text", 10, "doc_id")
    assert(out.select("doc_id", "sample_rank").collect().toSet ===
      again.select("doc_id", "sample_rank").collect().toSet)
  }
}
