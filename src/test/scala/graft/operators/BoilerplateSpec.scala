package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSuite {
  import spark.implicits._

  private val corpus = Seq(
    // site A: "NAV | HOME" heads 3 of 4 docs
    ("a", 1L, "NAV | HOME\nalpha content one\nfooter (c) ssu"),
    ("a", 2L, "NAV | HOME\nbeta content two\nfooter (c) ssu"),
    ("a", 3L, "NAV | HOME\ngamma content three"),
    ("a", 4L, "delta content four"),
    // site B: the SAME line appears once only — must survive there
    ("b", 5L, "NAV | HOME\nepsilon content five"),
    ("b", 6L, "zeta content six")
  ).toDF("site", "doc_id", "text")

  test("lines above the df threshold are stripped; order preserved; groups isolated") {
    val out = Boilerplate.strip(corpus, "site", "doc_id", "text", 1, 2)
      .select("doc_id", "text", "n_lines", "n_removed")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // site A (4 docs, threshold 2): NAV (3 docs) and footer (2 docs) both go
    assert(out(1L) === (("alpha content one", 3L, 2L)))
    assert(out(2L) === (("beta content two", 3L, 2L)))
    assert(out(3L) === (("gamma content three", 2L, 1L)))
    assert(out(4L) === (("delta content four", 1L, 0L)))
    // site B (2 docs, threshold 1 -> every line with df>=1 ... no: 1*2 >= 2*1
    // means even single-occurrence lines qualify there. Use a stricter run
    // below for B; here just assert A's lines never leak into B's set.
    assert(out(5L)._1.contains("epsilon") || out(5L)._1.isEmpty)
  }

  test("group isolation at a 2/3 threshold: shared line stripped only where common") {
    val out = Boilerplate.strip(corpus, "site", "doc_id", "text", 2, 3)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // site A: NAV in 3/4 >= 2/3 -> stripped; footer 2/4 < 2/3 -> kept
    assert(out(1L) === "alpha content one\nfooter (c) ssu")
    // site B: NAV in 1/2 < 2/3 -> kept
    assert(out(5L) === "NAV | HOME\nepsilon content five")
  }

  test("a fully-boilerplate document keeps its row with empty text") {
    val df = Seq(
      ("a", 1L, "SAME"), ("a", 2L, "SAME"), ("a", 3L, "SAME\nunique tail")
    ).toDF("site", "doc_id", "text")
    val m = Boilerplate.strip(df, "site", "doc_id", "text", 1, 2)
      .select("doc_id", "text", "n_removed").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(m(1L) === (("", 1L)))
    assert(m(3L) === (("unique tail", 1L)))
  }

  test("lines are trimmed before counting; blank lines never count") {
    val df = Seq(
      ("a", 1L, "  HEAD  \nbody one\n\n  \n"),
      ("a", 2L, "HEAD\nbody two")
    ).toDF("site", "doc_id", "text")
    val keys = Boilerplate.boilerplateKeys(df, "site", "doc_id", "text", 1, 1)
    // only HEAD reaches df = 2/2; the blank variants never appear
    assert(keys.count() === 1)
    val out = Boilerplate.strip(df, "site", "doc_id", "text", 1, 1)
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "body one")
  }

  test("strip plans a broadcast join, never a sort-merge join") {
    val plan = Boilerplate.strip(corpus, "site", "doc_id", "text", 1, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop") ||
      plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
