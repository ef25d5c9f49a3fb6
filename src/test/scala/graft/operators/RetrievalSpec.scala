package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/**
 * BM25 retrieval, the hashed-feature linear quality model, and
 * cross-corpus MinHash screening (the incremental-ingest near-dup gate).
 */
class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  test("bm25Search: tf and length sensitivity, topK bound, determinism") {
    val docs = Seq(
      (1L, "apple banana cherry date egg fig"), // 1 hit, len 6
      (2L, "apple apple apple banana cherry date egg fig grape kiwi"), // 3 hits, len 10
      (3L, "cherry date egg fig grape kiwi lemon mango"), // 0 hits
      (4L, "apple banana"), // 1 hit, len 2 (shortest)
      (5L, "apple apple banana cherry")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25Search(docs, "doc_id", "text",
      queryTerms = Seq("apple"), topK = 3)
    val rows = out.orderBy("rank").collect()
    assert(rows.length === 3, "topK bounds the result")
    // higher tf wins; at equal tf the shorter document wins (b > 0)
    val ranked = rows.map(_.getLong(0)).toSeq
    assert(ranked.head === 2L || ranked.head === 5L,
      s"a multi-hit doc must rank first, got $ranked")
    assert(!ranked.contains(3L), "documents without query terms are absent")
    val shortIdx = ranked.indexOf(4L)
    val longIdx = ranked.indexOf(1L)
    if (shortIdx >= 0 && longIdx >= 0)
      assert(shortIdx < longIdx, "equal tf: shorter doc scores higher")
    val again = TextAnalysis.bm25Search(docs, "doc_id", "text",
      queryTerms = Seq("apple"), topK = 3).orderBy("rank").collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("bm25Search: multi-term total adds per-term scores in term order") {
    val docs = Seq(
      (1L, "x y x y z"),
      (2L, "x q r s t u v w")
    ).toDF("doc_id", "text")
    val both = TextAnalysis.bm25Search(docs, "doc_id", "text", Seq("x", "y"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val xOnly = TextAnalysis.bm25Search(docs, "doc_id", "text", Seq("x"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 2 has no 'y': its two-term score equals its x-only score (same
    // idf inputs: df(x) is computed over the same corpus either way)
    assert(math.abs(both(2L) - xOnly(2L)) < 1e-9)
    assert(both(1L) > xOnly(1L), "the y term adds positive score for doc 1")
  }

  test("hashedLinearScore: exact integer score from the generated weights") {
    def bucket(tok: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 2), 16)
    }
    def weight(b: Long): Long = ((b * 2654435761L) % 1000003L) % 2001L - 1000L
    val docs = Seq((7L, "alpha beta alpha"), (8L, "gamma")).toDF("doc_id", "text")
    val out = TextAnalysis.hashedLinearScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    val expected7 = 2 * weight(bucket("alpha")) + weight(bucket("beta"))
    val expected8 = weight(bucket("gamma"))
    assert(out(7L)._1 === expected7)
    assert(out(8L)._1 === expected8)
    assert(out(7L)._2 === (if (expected7 >= 0) 1 else 0))
    assert(out(8L)._2 === (if (expected8 >= 0) 1 else 0))
  }

  test("crossCorpusMinhashPairs: exact dup found, disjoint absent, batch-only pairs") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "completely different words about spark catalyst plans here"),
      (3L, "the quick brown fox jumps over the lazy dog again today") // in-corpus dup of 1
    ).toDF("doc_id", "text")
    val batch = Seq(
      ("b1", "the quick brown fox jumps over the lazy dog again today"), // dup of 1 and 3
      ("b2", "zebra yak xylophone walrus vulture termite snail rabbit")  // disjoint
    ).toDF("doc_id", "text")
    val out = Dedup.crossCorpusMinhashPairs(corpus, batch, "doc_id", "text",
      n = 3, perms = 6, bands = 3, threshold = 0.5)
    val pairs = out.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs.contains(("b1", 1L, 1.0)) && pairs.contains(("b1", 3L, 1.0)),
      s"exact duplicate must verify at jaccard 1.0, got $pairs")
    assert(!pairs.exists(_._1 == "b2"), "disjoint batch doc pairs with nothing")
    // the in-corpus dup pair (1,3) must NOT appear: the operator screens
    // batch-vs-corpus only, never corpus-vs-corpus
    assert(pairs.forall(p => p._1.startsWith("b")), "only batch-led pairs")
  }

  test("md5_minhash_bands kernel: value-identical to the substring(md5) column chain") {
    // the chain the DuckDB oracle replays — the kernel must match it
    // byte-for-byte on every band key (incl. duplicate shingles, short
    // docs, punctuation/whitespace runs, and the empty-gram edge)
    val (n, perms, bands) = (3, 6, 3)
    val rows = perms / bands
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "alpha beta alpha beta alpha beta alpha beta"), // duplicate grams
      (3L, "one two three"),                               // exactly n tokens
      (4L, "short doc"),                                   // < n tokens
      (5L, "  MIXED   Case\ttokens\nwith   runs  of whitespace and CAPS "),
      (6L, "")                                             // empty
    ).toDF("doc_id", "text")
    val sh = Dedup.shingles(col("text"), n)
    val sig = array((0 until perms).map(p =>
      array_min(transform(col("_h"), h => substring(h, 1 + 5 * p, 5)))): _*)
    val chain = docs.select(col("doc_id"), sh.as("_sh"))
      .filter(size(col("_sh")) > 0)
      .withColumn("_h", transform(col("_sh"), s => md5(s)))
      .withColumn("_sig", sig)
      .withColumn("_bands", transform(sequence(lit(0), lit(bands - 1)),
        i => concat_ws("", slice(col("_sig"), i * rows + 1, lit(rows)))))
      .select(col("doc_id"), col("_bands"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val kernel = docs.select(col("doc_id"),
        graft.functions.GraftFunctions.md5_minhash_bands(
          col("text"), n, perms, bands).as("_bands"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(kernel(4L).isEmpty && kernel(6L).isEmpty,
      "sub-n-token docs produce no band keys")
    for (id <- chain.keys) assert(kernel(id) === chain(id),
      s"band keys for doc $id must match the column chain")
  }

  test("md5_minhash_bands kernel: rejects window geometry it cannot honor") {
    // the kernel is SQL-registered, so it guards its own bounds: perms > 6
    // would read past the 16-byte digest; bands not dividing perms would
    // silently drop minima; rows = 0 would emit identical empty keys
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    for ((n, perms, bands) <- Seq((3, 7, 7), (3, 6, 4), (3, 2, 3), (0, 6, 3))) {
      val ex = intercept[Exception] {
        docs.select(graft.functions.GraftFunctions.md5_minhash_bands(
          col("text"), n, perms, bands)).collect()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: causes(t.getCause)
      assert(causes(ex).exists(_.isInstanceOf[IllegalArgumentException]),
        s"(n=$n, perms=$perms, bands=$bands) must raise IllegalArgumentException")
    }
  }

  test("crossCorpusMinhashPairs: near-dup above threshold survives the bands") {
    // 20-token doc with one token changed: J ~= (18-?)/(...) well over 0.5
    val base = (1 to 20).map(i => s"tok$i").mkString(" ")
    val pert = ((1 to 10).map(i => s"tok$i") ++ Seq("CHANGED") ++
      (12 to 20).map(i => s"tok$i")).mkString(" ")
    val corpus = Seq((1L, base)).toDF("doc_id", "text")
    val batch = Seq(("b1", pert)).toDF("doc_id", "text")
    val out = Dedup.crossCorpusMinhashPairs(corpus, batch, "doc_id", "text",
      n = 3, perms = 6, bands = 3, threshold = 0.5).collect()
    assert(out.length === 1, "the perturbed near-dup must be found")
    val j = out.head.getDouble(2)
    assert(j > 0.5 && j < 1.0, s"jaccard strictly between 0.5 and 1, got $j")
  }
}
