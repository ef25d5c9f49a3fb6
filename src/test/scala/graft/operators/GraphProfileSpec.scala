package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** PageRank, column profiling, and corpus-LM scoring semantics. */
class GraphProfileSpec extends SparkSuite {
  import spark.implicits._

  // ---- PageRank ----

  test("pageRank: ranks sum to 1 and converge to the known star answer") {
    // star graph: 1,2,3 all link to 0; 0 is dangling
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("src", "dst")
    val r = Graph.pageRank(nodes, edges, iterations = 30)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-4)
    // center must dominate; the three leaves are symmetric
    assert(r(0L) > r(1L))
    assert(r(1L) === r(2L) && r(2L) === r(3L))
  }

  test("pageRank: uniform cycle stays uniform (fixed point)") {
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst")
    val r = Graph.pageRank(nodes, edges, iterations = 3)
      .collect().map(_.getDouble(1)).distinct
    assert(r.length === 1 && math.abs(r.head - 0.25) < 1e-9)
  }

  test("pageRank: dangling mass is redistributed (sum stays 1)") {
    // 0 -> 1, 1 dangling: without redistribution the sum decays each round
    val nodes = Seq(0L, 1L).toDF("id")
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    val r = Graph.pageRank(nodes, edges, iterations = 10)
      .collect().map(_.getDouble(1))
    assert(math.abs(r.sum - 1.0) < 1e-4)
  }

  // ---- Profile ----

  test("profile: nulls, exact distinct, native-type min/max") {
    val df = Seq[(java.lang.Long, String)](
      (9L, "b"), (10L, null), (2L, "a"), (null, "a"))
      .toDF("k", "s")
    val p = Profile.profile(df, Seq("k", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    // min/max on the NATIVE long: 2..10 (a lexicographic string min/max
    // would wrongly read "10".."9")
    assert(p("k") === ((4L, 1L, 3L, "2", "10")))
    assert(p("s") === ((4L, 1L, 2L, "a", "b")))
  }

  test("profile: single aggregate pass (one Exchange in the plan)") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val plan = Profile.profile(df, Seq("k", "s"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange [a-z]*partitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"profile should not shuffle per column:\n$plan")
  }

  // ---- lmScore ----

  test("lmScore: hand-checked bigram log-frequencies; short docs absent") {
    val docs = Seq(
      (1L, "a b a b"),   // bigrams: "a b" x2, "b a" x1
      (2L, "a b"),       // bigram: "a b"
      (3L, "zzz")        // single token: no bigrams -> absent
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!out.contains(3L))
    // corpus: "a b"=3, "b a"=1, total=4
    val pAB = math.log(3.0 / 4)
    val pBA = math.log(1.0 / 4)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) === r6((pAB + pBA + pAB) / 3))
    assert(out(2L) === r6(pAB))
  }

  test("lmScore: gram strings never reach a shuffle (hashed before join)") {
    val docs = Seq((1L, "x y z"), (2L, "x y w")).toDF("doc_id", "text")
    val plan = TextAnalysis.lmScore(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // the count/join key is the xxhash64 of the gram, computed before the
    // localCheckpoint barrier; no Exchange carries a string gram column
    assert(!plan.contains("hashpartitioning(g#"),
      s"gram strings must not be a shuffle key:\n$plan")
  }
}
