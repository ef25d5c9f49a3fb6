package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Sessionization, vocabulary, and n-gram count semantics. */
class SessionsTextSpec extends SparkSuite {
  import spark.implicits._

  private def ev(id: Long, user: Long, t: String, v: Double) =
    (id, user, Timestamp.valueOf(t), v)

  test("sessionize splits on gaps > gapSec, aggregates per session") {
    val events = Seq(
      // user 1: two sessions — 10:00-10:10 (3 events), then 11:30 (1 event)
      ev(1, 1, "2024-01-01 10:00:00", 1.00),
      ev(2, 1, "2024-01-01 10:05:00", 2.50),
      ev(3, 1, "2024-01-01 10:10:00", 0.25),
      ev(4, 1, "2024-01-01 11:30:00", 4.00),
      // user 2: one session; the 30-min gap is INCLUSIVE (exactly 1800 s
      // does not split)
      ev(5, 2, "2024-01-01 09:00:00", 1.00),
      ev(6, 2, "2024-01-01 09:30:00", 1.00)
    ).toDF("event_id", "user_id", "ts", "value")

    val out = Sessions.sessionize(events)
      .orderBy("user_id", "session_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(out === Seq(
      (1L, 1L, 3L, 375L), // 1.00 + 2.50 + 0.25 in cents
      (1L, 2L, 1L, 400L),
      (2L, 1L, 2L, 200L)))
  }

  test("sessionize ties on ts break on the tie column; session ids are 1-based and dense") {
    val events = Seq(
      ev(9, 7, "2024-01-01 10:00:00", 1.0),
      ev(8, 7, "2024-01-01 10:00:00", 1.0), // same ts, lower id first
      ev(10, 7, "2024-01-01 12:00:00", 1.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val ids = Sessions.sessionize(events)
      .orderBy("session_id").select("session_id", "n_events")
      .as[(Long, Long)].collect()
    assert(ids === Seq((1L, 2L), (2L, 1L)))
  }

  test("vocabulary counts tf over all occurrences, df over documents, cuts at minDf") {
    val docs = Seq(
      (1L, "the cat the hat"),
      (2L, "the dog"),
      (3L, "a dog barks")
    ).toDF("doc_id", "text")
    val v = TextAnalysis.vocabulary(docs, "doc_id", "text", minDf = 2L)
      .orderBy("token").as[(String, Long, Long)].collect()
    assert(v === Seq(("dog", 2L, 2L), ("the", 3L, 2L)))
  }

  test("ngram counts: adjacent bigrams within docs only, short docs contribute nothing") {
    val docs = Seq(
      (1L, "a b c"),
      (2L, "a b"),
      (3L, "x") // shorter than n: no grams (and no descending-sequence blowup)
    ).toDF("doc_id", "text")
    val g = TextAnalysis.ngramCounts(docs, "text", n = 2, minCount = 1L)
      .orderBy("ngram").as[(String, Long)].collect()
    assert(g === Seq(("a b", 2L), ("b c", 1L)))
    // trigrams cross the doc boundary never
    val g3 = TextAnalysis.ngramCounts(docs, "text", n = 3, minCount = 1L)
      .as[(String, Long)].collect()
    assert(g3 === Seq(("a b c", 1L)))
  }

  test("sessionize plan reuses one exchange across windows and the session aggregate") {
    val events = Seq(ev(1, 1, "2024-01-01 10:00:00", 1.0),
      ev(2, 1, "2024-01-01 10:05:00", 1.0)).toDF("event_id", "user_id", "ts", "value")
    val plan = Sessions.sessionize(events).queryExecution.executedPlan.toString
    // hash(user_id) clusters every (user_id, session_id) group, so the
    // final aggregate must NOT add a second shuffle
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected a single user_id exchange, plan:\n$plan")
  }
}
